"""Host-side process-pool map for chemistry work.

The reference fans RDKit work out with pathos pools
(Utils/mapper.py:32-38, Utils/properties.py:155-157); same idea with
stdlib multiprocessing, falling back to serial map when n_jobs==1 or
the callable isn't picklable (lambdas)."""

from __future__ import annotations

import multiprocessing as mp
from typing import Callable, List, Sequence


def pmap(fn: Callable, items: Sequence, n_jobs: int = 1,
         chunksize: int = 256) -> List:
    items = list(items)
    if n_jobs <= 1 or len(items) < 2 * chunksize:
        return [fn(x) for x in items]
    try:
        ctx = mp.get_context("fork")
        with ctx.Pool(n_jobs) as pool:
            return pool.map(fn, items, chunksize=chunksize)
    except Exception:
        return [fn(x) for x in items]
