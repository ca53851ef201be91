#!/usr/bin/env python
"""Content-addressed manifest for golden test artifacts.

The analog of the reference's scripts/upload_references.py (sha256-addressed
upload of tests/reference images, emitting a cmake download manifest): this
environment has no egress, so the manifest is generated locally and checked
in CI — `--check` fails if any committed golden drifted from its recorded
hash without a deliberate regeneration.

Usage:
    python scripts/golden_manifest.py            # (re)write the manifest
    python scripts/golden_manifest.py --check    # verify goldens match
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

GOLDEN_DIR = Path(__file__).parent.parent / "tests" / "golden"
MANIFEST = GOLDEN_DIR / "manifest.json"


def sha256(path: Path) -> str:
    h = hashlib.sha256()
    h.update(path.read_bytes())
    return h.hexdigest()


def build() -> dict[str, str]:
    return {p.name: sha256(p) for p in sorted(GOLDEN_DIR.glob("*.npz"))}


def main() -> int:
    current = build()
    if "--check" in sys.argv:
        if not MANIFEST.exists():
            print("manifest missing; run scripts/golden_manifest.py first")
            return 1
        recorded = json.loads(MANIFEST.read_text())
        bad = {k for k in set(current) | set(recorded) if current.get(k) != recorded.get(k)}
        if bad:
            print("golden drift detected:", ", ".join(sorted(bad)))
            return 1
        print(f"ok: {len(current)} goldens match the manifest")
        return 0
    MANIFEST.write_text(json.dumps(current, indent=2) + "\n")
    print(f"wrote {MANIFEST} ({len(current)} entries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
