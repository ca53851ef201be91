#!/bin/bash
# Package-consumption check (the reference's scripts/pkg-check analog):
# build the wheel, install it into a CLEAN venv (no repo on the path), and
# smoke the installed console scripts + packaged native library.
# CI runs the same steps (.github/workflows/ci.yml); this script makes the
# check repeatable locally — including on boxes where the base interpreter
# is itself a venv (pip deps exposed via a .pth, no network needed).
set -euo pipefail
cd "$(dirname "$0")/.."

make -C vision_tpu/native >/dev/null
rm -rf dist
python -m build --wheel --no-isolation >/dev/null

VENV=$(mktemp -d)/venv
python -m venv "$VENV"
BASE_SITE=$(python -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
VENV_SITE=$("$VENV/bin/python" -c "import sysconfig; print(sysconfig.get_paths()['purelib'])")
echo "$BASE_SITE" > "$VENV_SITE/base.pth"   # expose jax/numpy/... deps
"$VENV/bin/pip" install -q --no-deps --no-index dist/vision_tpu-*.whl

cd "$(mktemp -d)"  # import from the installed wheel, not the source tree
export JAX_PLATFORMS=cpu
"$VENV/bin/vision-cli" --help >/dev/null
"$VENV/bin/vision-convert" --help >/dev/null
"$VENV/bin/python" -c "
import vision_tpu, vision_tpu.native as n
assert n.available(), 'wheel is missing libvisphost.so'
assert 'venv' in vision_tpu.__file__, vision_tpu.__file__
print('pkg-check ok:', vision_tpu.__file__)
"
