"""Shared bounded thread-pool prefetch pump for host-side batch builders.

Yields ``builder(*args)`` results in order with up to ``workers`` builds
in flight — overlapping host work (padding, plan builds, sampling) with
device execution. Builders must be pure host-side (no device puts: the
consumer's single ``jax.tree.map(jnp.asarray)`` moves each item)."""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator


def prefetched(builder: Callable, args_iter: Iterable[tuple],
               workers: int) -> Iterator:
    if not workers:
        for args in args_iter:
            yield builder(*args)
        return
    with ThreadPoolExecutor(workers) as ex:
        futs = deque()
        it = iter(args_iter)
        for args in it:
            futs.append(ex.submit(builder, *args))
            if len(futs) >= workers:
                break
        while futs:
            item = futs.popleft().result()
            try:
                futs.append(ex.submit(builder, *next(it)))
            except StopIteration:
                pass
            yield item
