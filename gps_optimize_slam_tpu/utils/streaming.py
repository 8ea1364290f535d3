"""Software-pipelined host↔device chunk streaming.

The out-of-core drivers (ops.kalman_chunked, models.fusion_chunked) move a
trajectory through the device one chunk at a time. JAX dispatch is
asynchronous: a jitted call returns device futures immediately, and only a
host read (``np.asarray``) blocks. A naive loop

    stage → launch → drain → stage → launch → drain → …

therefore serialises three things that can overlap: host-side staging of the
NEXT chunk (padding + ``device_put``), device compute of the CURRENT chunk,
and the host read-back of the PREVIOUS chunk's outputs. On a remote-tunneled
device every one of those legs carries wire latency, so the serial loop pays
~3× RTT per chunk.

``stream_chunks`` runs the same three callbacks one chunk apart — a classic
double-buffer. Kernel launches still happen strictly in item order (the
chunked scans thread carries through ``launch``), only the host work slides.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

_SENTINEL = object()


def stream_chunks(
    items: Iterable[Any],
    stage: Callable[[Any], Any],
    launch: Callable[[Any, Any], Any],
    drain: Optional[Callable[[Any, Any], None]],
) -> None:
    """Drive ``drain(i-1) ∥ launch(i) ∥ stage(i+1)`` over ``items``.

    * ``stage(item)`` — host prep + ``jax.device_put`` for one chunk's
      inputs. Called one item AHEAD of its launch (and before the previous
      item's drain), so transfers enqueue while the device is busy.
    * ``launch(item, staged)`` — dispatch the jitted kernel(s); must NOT
      block on results. Called strictly in item order, so carry chains
      (e.g. the re-entrant associative-scan elements) stay correct.
    * ``drain(item, launched)`` — pull outputs to host (``np.asarray``)
      and write them out. Called after the NEXT item's launch, so the
      blocking read overlaps that chunk's device compute. ``None`` skips
      draining (launch-side effects only).

    Equivalent to the naive loop for any callbacks without hidden ordering
    assumptions between a drain and the following stage/launch.
    """
    it = iter(items)
    item = next(it, _SENTINEL)
    staged = stage(item) if item is not _SENTINEL else None
    pending = None
    while item is not _SENTINEL:
        launched = launch(item, staged)
        nxt = next(it, _SENTINEL)
        staged = stage(nxt) if nxt is not _SENTINEL else None
        if pending is not None and drain is not None:
            drain(*pending)
        pending = (item, launched)
        item = nxt
    if pending is not None and drain is not None:
        drain(*pending)
