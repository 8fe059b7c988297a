"""Per-stage timing instrumentation.

Equivalent of the reference's hand-rolled ``TimeVector`` + ``print_average``
(main.cpp:31-40, 181-201; LoopHandler.h:131-139): named vectors of
wall-clock spans, averaged and printed at shutdown with the same stage
names so timing tables are comparable side-by-side."""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List


class StageTimers:
    def __init__(self):
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        self.times[name].append(seconds)

    def average_ms(self, name: str) -> float:
        v = self.times.get(name, [])
        return 1000.0 * sum(v) / len(v) if v else 0.0

    def count(self, name: str) -> int:
        return len(self.times.get(name, []))

    def report(self, names=None) -> str:
        names = names or sorted(self.times)
        lines = []
        for n in names:
            lines.append(f"{n}: {self.average_ms(n):.2f}ms x {self.count(n)}")
        return "\n".join(lines)
