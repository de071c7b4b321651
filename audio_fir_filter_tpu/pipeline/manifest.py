"""Resumable batch manifest.

The reference aborts a batch mid-way on any error, abandoning the remaining
files and possibly leaving partial outputs (/root/reference/main.cp:132-147,
157-160; SURVEY.md §5 "failure detection"). This framework:

- writes outputs atomically (audio/file.py: temp + rename), so no partial
  files exist, and
- records per-file completion in a manifest JSON next to the destination
  directory, so re-running the same batch skips completed files
  (the manifest IS the checkpoint — there is no model state to checkpoint).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

MANIFEST_NAME = ".lowcut_manifest.json"


class BatchManifest:
    def __init__(self, dest_dir: Path, options_fingerprint: str):
        self.path = Path(dest_dir) / MANIFEST_NAME
        self.fingerprint = options_fingerprint
        self.done: dict[str, bool] = {}
        if self.path.exists():
            try:
                data = json.loads(self.path.read_text())
                if data.get("options") == options_fingerprint:
                    self.done = dict(data.get("done", {}))
            except (json.JSONDecodeError, OSError):
                pass  # corrupt manifest: start fresh

    def is_done(self, input_path) -> bool:
        return self.done.get(str(input_path), False)

    def mark_done(self, input_path) -> None:
        self.done[str(input_path)] = True
        self._flush()

    def _flush(self) -> None:
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(
            {"options": self.fingerprint, "done": self.done}, indent=1))
        os.replace(tmp, self.path)

    def clear(self) -> None:
        if self.path.exists():
            self.path.unlink()


def options_fingerprint(opts) -> str:
    """Stable fingerprint of the filter-relevant options: resuming with
    different filter settings must not skip files."""
    return json.dumps(
        [opts.freq, opts.slope, opts.normalize, opts.precision, opts.block_size]
    )
