#!/bin/bash
# Development environment setup for lambda-snark-tpu.
set -e

echo "lambda-snark-tpu setup"
echo

command -v python3 >/dev/null || { echo "python3 required"; exit 1; }
python3 - <<'PY'
import importlib, sys
missing = [m for m in ("jax", "numpy", "pytest") if importlib.util.find_spec(m) is None]
if missing:
    print(f"missing python deps: {missing} (pip install {' '.join(missing)})")
    sys.exit(1)
print("python deps: ok (jax, numpy, pytest)")
PY

if command -v cmake >/dev/null && command -v ninja >/dev/null; then
    echo "building native library..."
    cmake -S native -B native/build -G Ninja >/dev/null
    ninja -C native/build >/dev/null
    echo "native library: built"
else
    echo "cmake/ninja not found: native library skipped (pure-Python mode works)"
fi

echo
echo "smoke test:"
python3 -m lambda_snark_tpu --ring-degree 64 r1cs-example
echo
echo "done. run 'make test' for the full suite."
