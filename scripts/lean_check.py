#!/usr/bin/env python3
"""Type-check the emitted Lean certificate artifacts with a real Lean 4
toolchain against the reference's formal package.

This closes the loop VERDICT round 3 flagged: ``lean/certificates.py``
regenerates the certificate *data* declarations byte-compatibly with the
reference's ``formal/tests/*.lean`` files, but nothing in-sandbox ever fed
an emitted artifact to Lean itself. This script does, wherever a toolchain
exists (CI; any dev machine with elan):

    python scripts/lean_check.py --formal <path-to-reference>/formal

For each artifact under ``artifacts/lean/`` it writes a wrapper module into
a scratch copy of the formal package — the reference test file's own import
preamble and ``namespace LambdaSNARK.Tests`` opener (the artifacts are the
data *sections* of those files) — and runs ``lake env lean`` on it. Any
artifact that stops being valid Lean fails the command.

Exit codes: 0 ok; 1 check failed; 3 toolchain missing (CI treats 3 as a
hard failure; locally it just reports).
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# import preamble per artifact: the same modules the corresponding
# reference test file imports (formal/tests/*.lean)
WRAPPERS = {
    "ForkingCertificateData.lean": [
        "import LambdaSNARK.Core",
        "import LambdaSNARK.ForkingInfrastructure",
        "import Mathlib.Algebra.Polynomial.Basic",
        "import Mathlib.Data.ZMod.Basic",
        "namespace LambdaSNARK.Tests",
        "open LambdaSNARK Polynomial",
    ],
    "HealthcareCircuitData.lean": [
        "import LambdaSNARK.Core",
        "import Mathlib.Data.ZMod.Basic",
        "open LambdaSNARK",
        "open scoped BigOperators",
        "namespace LambdaSNARK.Tests",
        "noncomputable section",
    ],
    "HealthcareWitnessData.lean": [
        "import LambdaSNARK.Core",
        "import Mathlib.Data.ZMod.Basic",
        "open LambdaSNARK",
        "namespace LambdaSNARK.Tests",
        "noncomputable section",
    ],
    # security-parameter arithmetic certificate (docs/security_analysis.md §5)
    "SecurityParamsData.lean": [
        "import LambdaSNARK.Core",
        "namespace LambdaSNARK.Tests",
    ],
}

# HealthcareWitnessData references the circuit's R1CS declarations
PREREQ = {
    "HealthcareWitnessData.lean": "HealthcareCircuitData.lean",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--formal",
        default="/root/reference/formal",
        help="path to the reference formal/ package (lakefile + LambdaSNARK/)",
    )
    ap.add_argument(
        "--artifacts", default=os.path.join(REPO, "artifacts", "lean")
    )
    args = ap.parse_args()

    lake = shutil.which("lake")
    if lake is None:
        print(
            "lean_check: no `lake` toolchain on PATH — cannot type-check. "
            "Run in CI (job `lean`) or install elan.",
            file=sys.stderr,
        )
        return 3
    if not os.path.isfile(os.path.join(args.formal, "lakefile.lean")):
        print(f"lean_check: no lakefile at {args.formal}", file=sys.stderr)
        return 3

    scratch = tempfile.mkdtemp(prefix="lean_check_")
    pkg = os.path.join(scratch, "formal")
    shutil.copytree(args.formal, pkg)
    # build the library once so wrapper checks only compile the artifact
    subprocess.run(
        [lake, "build", "LambdaSNARK"], cwd=pkg, check=True
    )

    failures = []
    for name, preamble in WRAPPERS.items():
        src = os.path.join(args.artifacts, name)
        if not os.path.isfile(src):
            failures.append(f"{name}: artifact missing")
            continue
        parts = list(preamble)
        prereq = PREREQ.get(name)
        if prereq is not None:
            with open(os.path.join(args.artifacts, prereq)) as f:
                parts.append(f.read())
        with open(src) as f:
            parts.append(f.read())
        # close scopes innermost-first: every `... section` opener in the
        # preamble needs a bare `end` before the namespace's named end
        # (the reference test files do exactly this, e.g.
        # HealthcareCircuit.lean ends with `end` then `end LambdaSNARK.Tests`)
        for line in reversed(preamble):
            if line.endswith("section"):
                parts.append("end")
        parts.append("end LambdaSNARK.Tests")
        wrapper = os.path.join(pkg, f"ArtifactCheck_{name}")
        with open(wrapper, "w") as f:
            f.write("\n".join(parts) + "\n")
        proc = subprocess.run(
            [lake, "env", "lean", wrapper], cwd=pkg,
            capture_output=True, text=True,
        )
        if proc.returncode != 0:
            failures.append(f"{name}:\n{proc.stdout}\n{proc.stderr}")
        else:
            print(f"lean_check: {name} OK")

    if failures:
        print("lean_check FAILED:\n" + "\n".join(failures), file=sys.stderr)
        return 1
    print("lean_check: all emitted artifacts type-check")
    return 0


if __name__ == "__main__":
    sys.exit(main())
