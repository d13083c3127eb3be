"""Streaming multi-file WAV data loader with background prefetch.

The serving-side input pipeline the reference's one-WAV-per-run design
implies but never built: iterate fixed-size interleaved chunks across a
list of WAV files as one continuous stream (file boundaries are seamless,
matching how the streaming ops carry state), decode on a background thread,
and optionally stage to device one step ahead so host IO overlaps TPU
compute. Uses the native C++ codec when built, NumPy otherwise.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterator

import numpy as np

from .wav import read_wav


def _read(path) -> tuple[int, int, np.ndarray]:
    try:
        from . import native

        if native.available():
            ch, rate, data = native.read_wav_native(path)
            return ch, rate, data
    except Exception:
        pass
    info, data = read_wav(path)
    return info.num_channels, info.sample_rate, data


def _read_info(path) -> tuple[int, int]:
    """(channels, sample_rate) from the 44-byte header only — no body decode."""
    try:
        from . import native

        if native.available():
            ch, rate, _ = native.wav_info_native(path)
            return ch, rate
    except Exception:
        pass
    from .wav import read_wav_info

    info = read_wav_info(path)
    return info.num_channels, info.sample_rate


class WavChunkLoader:
    """Iterate fixed-size chunks over a list of WAVs as one stream.

    Yields int16 arrays of exactly ``chunk_samples`` (interleaved); the
    final partial chunk is zero-padded unless ``drop_remainder``. All files
    must share the channel count; sample-rate mismatches raise unless
    ``allow_rate_mismatch``.

    ``packed=True`` yields the int32 little-endian PAIR view of each chunk
    instead (``chunk.view(np.int32)`` — free on the host, half the array
    count over the transport). Downstream, ``moving_average`` dispatches
    int32 input straight to the packed windowed kernel — int32 VMEM tiles
    move at ~637 GB/s on v5e where int16 tiles relayout at ~358 GB/s.
    Requires ``chunk_samples % 256 == 0`` (lane-aligned pair count).
    """

    def __init__(
        self,
        paths,
        chunk_samples: int,
        *,
        drop_remainder: bool = False,
        allow_rate_mismatch: bool = False,
        packed: bool = False,
    ):
        self.paths = [Path(p) for p in paths]
        if not self.paths:
            raise ValueError("no input files")
        if chunk_samples < 1:
            raise ValueError(f"chunk_samples must be >= 1, got {chunk_samples}")
        if packed and chunk_samples % 256 != 0:
            # pair count must stay lane-aligned (128 int32 words) for the
            # packed kernel; 256 samples = 128 pairs
            raise ValueError(
                f"packed chunks need chunk_samples % 256 == 0, got {chunk_samples}"
            )
        self.chunk_samples = chunk_samples
        self.drop_remainder = drop_remainder
        self.allow_rate_mismatch = allow_rate_mismatch
        self.packed = packed
        # header-only peek: decoding the first file here would read its
        # whole body twice (again at iteration)
        ch, rate = _read_info(self.paths[0])
        self.channels = ch
        self.sample_rate = rate

    def _emit(self, chunk: np.ndarray) -> np.ndarray:
        if not self.packed:
            return chunk
        if not chunk.flags.c_contiguous:
            chunk = np.ascontiguousarray(chunk)
        return chunk.view(np.int32)  # free reinterpret, no copy

    def __iter__(self) -> Iterator[np.ndarray]:
        buf = np.empty(0, np.int16)
        for p in self.paths:
            ch, rate, data = _read(p)
            if ch != self.channels:
                raise ValueError(
                    f"{p}: {ch} channels != first file's {self.channels}"
                )
            if rate != self.sample_rate and not self.allow_rate_mismatch:
                raise ValueError(
                    f"{p}: sample rate {rate} != first file's {self.sample_rate}"
                )
            buf = np.concatenate([buf, data]) if buf.size else data
            while buf.size >= self.chunk_samples:
                yield self._emit(buf[: self.chunk_samples])
                buf = buf[self.chunk_samples :]
        if buf.size and not self.drop_remainder:
            out = np.zeros(self.chunk_samples, np.int16)
            out[: buf.size] = buf
            yield self._emit(out)


def prefetch(iterator, depth: int = 2):
    """Run an iterator on a background thread with a bounded queue."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def device_chunks(loader, *, sharding=None, depth: int = 2):
    """Prefetched chunks staged to device (overlaps host IO with compute)."""
    import jax

    def put(c):
        return jax.device_put(c, sharding) if sharding is not None else jax.device_put(c)

    for chunk in prefetch(iter(loader), depth=depth):
        yield put(chunk)
