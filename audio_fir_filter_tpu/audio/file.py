"""High-level audio file read/write with byte-exact metadata preservation.

Combines the chunk walker, format decoder, and PCM codec into the equivalent
of the reference flow at /root/reference/ProcessFile.cp:34-44 (read) and
:105-117 (write): the output file contains *every* input chunk in the
original order — unknown chunks copied verbatim — with only the sample
payload (WAVE ``data`` / AIFF ``SSND``) replaced by the re-encoded samples.

Writes are atomic (temp file + rename), an improvement over the reference
which can leave partially-written outputs on failure (SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os
import struct
import tempfile
from pathlib import Path

import numpy as np

from . import codec
from .chunks import (AIFF, WAVE, Chunk, Container, parse_container,
                     write_container)
from .format import AudioFormat, format_from_container
from ..utils.errors import AudioFormatError, FileNotFound

_DATA_CHUNK_ID = {WAVE: b"data", AIFF: b"SSND"}


@dataclasses.dataclass
class AudioData:
    """A fully-read audio file: container (all chunks), format, samples.

    ``samples`` is planar float32 [channels, frames], full scale ±1.0 —
    the analog of the reference's deinterleaved ``AudioBuffer``
    (ProcessFile.cp:41-44).
    """

    container: Container
    fmt: AudioFormat
    samples: np.ndarray

    @property
    def num_channels(self) -> int:
        return self.samples.shape[0]

    @property
    def num_frames(self) -> int:
        return self.samples.shape[1]

    @property
    def kind(self) -> str:
        return self.container.kind


def _extract_sample_bytes(container: Container) -> bytes:
    ckid = _DATA_CHUNK_ID[container.kind]
    chunk = container.find(ckid)
    if chunk is None:
        raise AudioFormatError(f"No {ckid.decode()} chunk found")
    if container.kind == AIFF:
        if len(chunk.data) < 8:
            raise AudioFormatError("SSND chunk too small")
        offset, _block_size = struct.unpack(">II", chunk.data[:8])
        return chunk.data[8 + offset :]
    return chunk.data


def _replace_sample_bytes(container: Container, payload: bytes) -> Container:
    """New container with the sample payload replaced, everything else kept."""
    ckid = _DATA_CHUNK_ID[container.kind]
    idx = container.find_index(ckid)
    old = container.chunks[idx]
    if container.kind == AIFF:
        offset, _bs = struct.unpack(">II", old.data[:8])
        head = old.data[: 8 + offset]  # keep original offset/blockSize/lead-in
        # join() accepts any buffer (payload may be a zero-copy memoryview).
        new_chunk = Chunk(ckid, b"".join((head, payload)))
    else:
        new_chunk = Chunk(ckid, payload)
    chunks = list(container.chunks)
    chunks[idx] = new_chunk
    return Container(kind=container.kind, form_type=container.form_type, chunks=chunks)


def _update_aiff_num_frames(container: Container, num_frames: int) -> Container:
    """Patch COMM numSampleFrames (kept consistent if frame count changed)."""
    idx = container.find_index(b"COMM")
    old = container.chunks[idx]
    data = bytearray(old.data)
    data[2:6] = struct.pack(">I", num_frames)
    chunks = list(container.chunks)
    chunks[idx] = Chunk(b"COMM", bytes(data))
    return Container(kind=container.kind, form_type=container.form_type, chunks=chunks)


def read_audio(path: str | os.PathLike) -> AudioData:
    """Read a WAVE or AIFF file fully: all chunks + decoded planar samples."""
    p = Path(path)
    if not p.is_file():
        raise FileNotFound(str(p))
    raw = p.read_bytes()
    container = parse_container(raw)
    fmt = format_from_container(container)
    if fmt.channels <= 0:
        raise AudioFormatError(f"Invalid channel count: {fmt.channels}")
    payload = _extract_sample_bytes(container)
    samples = codec.decode(payload, fmt)
    if fmt.num_frames is not None and samples.shape[1] > fmt.num_frames:
        # AIFF: COMM numSampleFrames is authoritative; SSND may be padded.
        samples = samples[:, : fmt.num_frames]
    return AudioData(container=container, fmt=fmt, samples=samples)


def write_audio(path: str | os.PathLike, data: AudioData,
                samples: np.ndarray | None = None) -> None:
    """Write an audio file: all input chunks verbatim, samples re-encoded.

    Equivalent to the reference's chunk-copy + writeAll sequence
    (ProcessFile.cp:105-117). Atomic: written to a temp file in the target
    directory, then renamed into place.
    """
    p = Path(path)
    out_samples = data.samples if samples is None else samples
    payload = codec.encode(out_samples, data.fmt)
    container = _replace_sample_bytes(data.container, payload)
    if container.kind == AIFF:
        container = _update_aiff_num_frames(container, out_samples.shape[1])

    fd, tmp_name = tempfile.mkstemp(
        dir=str(p.parent) if str(p.parent) else ".", prefix=".lowcut_tmp_"
    )
    try:
        with os.fdopen(fd, "wb") as f:
            # Streamed: no serialized blob (two full-payload copies saved).
            write_container(f, container)
        os.replace(tmp_name, p)
    except BaseException:
        try:
            os.unlink(tmp_name)
        except OSError:
            pass
        raise


def normalize(samples: np.ndarray) -> np.ndarray:
    """Scale ALL channels by one common factor so the global peak is ±1.0.

    Equivalent of the reference's static ``AudioSamples::normalize(buf)``
    (ProcessFile.cp:100): per-channel maxes reduced to one global max first
    (ProcessFile.cp:92-97), then a single scale applied everywhere.
    """
    peak = float(np.max(np.abs(samples))) if samples.size else 0.0
    if peak == 0.0:
        return samples
    return (samples.astype(np.float32) * np.float32(1.0 / peak)).astype(np.float32)
