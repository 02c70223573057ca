"""fxtpu.runtime — host-side concurrency & buffering (the reference's L4
layer, ``/root/reference/effex/effex.py:105-110,420-474,630-664``, rebuilt
as threads + preallocated ring buffers + a seq-number aligner)."""

from fxtpu.runtime.ringbuffer import RingBuffer, BufferFull, BufferClosed
from fxtpu.runtime.feeder import Feeder, BlockAligner

__all__ = ["RingBuffer", "BufferFull", "BufferClosed", "Feeder", "BlockAligner"]
