"""Host-side task parallelism for ingestion (the reference's Ray role).

``parallelise`` is a bounded-concurrency, order-preserving parallel map over
processes (reference src/wav2sleep/parallel.py:24-89 used ``ray.remote``
with a sliding window). On TPU-VM pods, ``shard_across_hosts`` splits a work
list across hosts so each host's CPUs ingest a disjoint partition — the
multi-node story without a Ray cluster.
"""

from __future__ import annotations

import logging
from concurrent.futures import FIRST_COMPLETED, ProcessPoolExecutor, ThreadPoolExecutor, wait
from typing import Callable, Iterable, TypeVar, Union

logger = logging.getLogger(__name__)

X = TypeVar('X')
Y = TypeVar('Y')


def parallelise(
    func: Callable[[X], Y],
    iterator: Iterable[X],
    max_parallel: int = 10,
    use_tqdm: bool = False,
    return_dict: bool = False,
    use_threads: bool = False,
) -> Union[list[Y], dict[X, Y]]:
    """Parallel map with bounded in-flight tasks and ordered results.

    Args:
        func: single-argument function (use functools.partial for extras).
        iterator: arguments.
        max_parallel: maximum concurrent tasks (each task gets one process).
        use_tqdm: progress bar.
        return_dict: map input -> result instead of an ordered list.
        use_threads: threads instead of processes (for GIL-releasing IO work
            or non-picklable closures).
    """
    items = list(iterator)
    if use_tqdm:
        try:
            from tqdm import tqdm
        except ImportError:
            tqdm = None
    else:
        tqdm = None
    progress = tqdm(total=len(items)) if tqdm else None

    pool_cls = ThreadPoolExecutor if use_threads else ProcessPoolExecutor
    results: list = [None] * len(items)
    with pool_cls(max_workers=max_parallel) as pool:
        pending = {}
        it = iter(enumerate(items))
        exhausted = False
        while pending or not exhausted:
            while not exhausted and len(pending) < max_parallel:
                try:
                    i, item = next(it)
                except StopIteration:
                    exhausted = True
                    break
                pending[pool.submit(func, item)] = i
            if not pending:
                break
            done, _ = wait(list(pending), return_when=FIRST_COMPLETED)
            for fut in done:
                i = pending.pop(fut)
                results[i] = fut.result()
                if progress:
                    progress.update(1)
    if progress:
        progress.close()
    if return_dict:
        return dict(zip(items, results))
    return results


def shard_across_hosts(items: list[X], process_index: int | None = None, process_count: int | None = None) -> list[X]:
    """This host's partition of a global work list (round-robin by
    ``jax.process_index`` across a TPU-VM pod)."""
    if process_index is None or process_count is None:
        try:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        except Exception:
            process_index, process_count = 0, 1
    return items[process_index::process_count]
