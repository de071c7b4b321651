"""BASELINE cfg4 artifact: 64-file batch through the 3-stage pipeline.

Generates 64 equal-length mono 44.1 kHz 16-bit WAVs (equal length keeps
one compiled executable across the batch) and times
``bin/lowcut <files...> <outdir>`` end to end. On this dev harness every
file's samples cross the ~1 MB/s tunnel twice, so the wall time is a
tunnel property; the per-stage metrics separate orchestration from
device time. Reference scenario: /root/reference/main.cp:132-147 (serial
loop); here the reader/device/writer stages overlap (pipeline/batch.py).
"""

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from audio_fir_filter_tpu.audio import Encoding  # noqa: E402
from audio_fir_filter_tpu.audio.synth import create_audio_file  # noqa: E402

FS = 44100.0
SECONDS = 2.0
N_FILES = 64


def main():
    tmp = Path(tempfile.mkdtemp(prefix="cfg4_"))
    (tmp / "out").mkdir()
    n = int(FS * SECONDS)
    rng = np.random.default_rng(0)
    files = []
    for i in range(N_FILES):
        x = rng.uniform(-0.5, 0.5, (1, n)).astype(np.float32)
        p = tmp / f"in_{i:02d}.wav"
        create_audio_file(p, x, FS, encoding=Encoding.PCM_16)
        files.append(str(p))
    print(f"cfg4: {N_FILES} x {SECONDS:g}s mono 44.1k 16-bit "
          f"({N_FILES * n} frames total)", file=sys.stderr)

    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "bin/lowcut", "-O", "-f", "20", "-s", "10",
         "--json-metrics", *files, str(tmp / "out")],
        capture_output=True, text=True,
        cwd=str(Path(__file__).resolve().parent.parent))
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        sys.exit(1)
    per_file = [json.loads(s) for s in proc.stderr.splitlines()
                if s.strip().startswith("{")]
    total_samples = N_FILES * n
    dev = sum(m.get("filter", 0.0) for m in per_file)
    print(f"cfg4 batch: {wall:.1f}s wall for {N_FILES} files "
          f"({total_samples / wall / 1e6:.2f} Ms/s incl. JAX init+compile; "
          f"sum of filter stages {dev:.1f}s, "
          f"audio dur {N_FILES * SECONDS:.0f}s -> "
          f"{N_FILES * SECONDS / wall:.1f}x realtime whole-tool on the "
          f"tunnel-fed dev chip)", file=sys.stderr)
    got = sorted((tmp / "out").iterdir())
    assert len(got) == N_FILES, f"expected {N_FILES} outputs, got {len(got)}"
    print(f"outputs: {len(got)} files OK", file=sys.stderr)
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
