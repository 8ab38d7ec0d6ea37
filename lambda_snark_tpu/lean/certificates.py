"""Regeneration of the reference's Lean certificate data from this stack.

The reference's formal layer consumes concrete circuit data committed as
Lean test files "exported from Rust" (``formal/tests/HealthcareCircuit.lean``,
``HealthcareWitnessData.lean``). ROADMAP #11: prove those certificates are
regenerable from *this* framework — parse the committed Lean data, compare
it structurally against the circuit built here, and emit an equivalent
data file so the existing Lean proofs (satisfiability, primitive-root and
quotient lemmas) keep type-checking against artifacts produced by the TPU
stack.

Only the *data* declarations are regenerated (matrices, witness, public
inputs, modulus); the lemmas/proof scripts in the reference files are
hand-written Lean and are left to the formal layer, exactly per
SURVEY.md §7 step 10 ("keep emitting the same artifact formats so the
existing proofs remain consumable").
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

Entry = Tuple[int, int, int]


def _parse_value(text: str, q: int) -> int:
    """Lean field literal -> canonical int mod q: ``1``, ``(2 : F)``,
    ``(-1 : HealthcareField)``."""
    text = text.strip()
    m = re.match(r"^\(?\s*(-?\d+)", text)
    if not m:
        raise ValueError(f"unparseable Lean field literal: {text!r}")
    return int(m.group(1)) % q


def parse_reference_circuit(source: str) -> Dict:
    """Extract (q, A/B/C entries, witness) from a HealthcareCircuit.lean-
    style file. Returns canonical ints mod q."""
    qm = re.search(r"def q : ℕ := (\d+)", source)
    if not qm:
        raise ValueError("modulus declaration not found")
    q = int(qm.group(1))
    mats: Dict[str, List[Entry]] = {}
    for name in "ABC":
        block = re.search(
            rf"healthcareMatrix{name}[^{{]*{{(.*?)}}", source, re.S
        )
        if not block:
            raise ValueError(f"matrix {name} not found")
        entries = []
        for em in re.finditer(
            r"\(\s*(\d+)\s*,\s*(\d+)\s*,\s*((?:\([^)]*\))|(?:-?\d+))\s*\)",
            block.group(1),
        ):
            entries.append(
                (int(em.group(1)), int(em.group(2)),
                 _parse_value(em.group(3), q))
            )
        mats[name] = entries
    witness = {}
    wit_block = re.search(
        r"def healthcareWitness[^|]*((?:\s*\|[^\n]*\n)+)", source
    )
    if wit_block:
        for wm in re.finditer(
            r"\|\s*⟨(\d+),\s*_⟩\s*=>\s*(-?\d+)", wit_block.group(1)
        ):
            witness[int(wm.group(1))] = int(wm.group(2)) % q
    dims = re.search(
        r"nVars := (\d+)\s*nCons := (\d+)\s*nPub := (\d+)", source
    )
    return {
        "q": q,
        "A": mats["A"],
        "B": mats["B"],
        "C": mats["C"],
        "witness": [witness[i] for i in sorted(witness)],
        "n_vars": int(dims.group(1)) if dims else None,
        "n_cons": int(dims.group(2)) if dims else None,
        "n_pub": int(dims.group(3)) if dims else None,
    }


def _coo_entries(mat, q: int) -> List[Entry]:
    """CSR SparseMatrix -> row-major COO entries with canonical values."""
    return [(r, c, int(v) % q) for r, c, v in mat.coo()]


def circuit_coo(r1cs) -> Dict[str, List[Entry]]:
    q = r1cs.modulus
    return {
        "A": _coo_entries(r1cs.a, q),
        "B": _coo_entries(r1cs.b, q),
        "C": _coo_entries(r1cs.c, q),
    }


def _lean_value(v: int, q: int, field: str) -> str:
    """Render canonical v with the reference's -1 convention."""
    if v == q - 1:
        return f"(-1 : {field})"
    if v == 1:
        return "1"
    return f"({v} : {field})"


def certificate_data_lean(r1cs, witness: Sequence[int],
                          field: str = "HealthcareField") -> str:
    """Emit the certificate *data* declarations in the reference's test-file
    shape (matrices, R1CS instance, witness) from a circuit built here."""
    q = r1cs.modulus
    coo = circuit_coo(r1cs)
    lines = [
        "/- Regenerated certificate data (lambda-snark-tpu; reference",
        "   format: formal/tests/HealthcareCircuit.lean). -/",
        "",
        f"private def q : ℕ := {q}",
        "",
        f"@[simp] abbrev {field} : Type := ZMod q",
        "",
    ]
    for name in "ABC":
        entries = coo[name]
        lines.append(
            f"noncomputable def healthcareMatrix{name} : SparseMatrix {field} :="
        )
        lines.append(f"  {{ nRows := {r1cs.m}")
        lines.append(f"    nCols := {r1cs.n}")
        if entries:
            body = [
                f"      [ ({r}, {c}, {_lean_value(v, q, field)})"
                if i == 0
                else f"      , ({r}, {c}, {_lean_value(v, q, field)})"
                for i, (r, c, v) in enumerate(entries)
            ]
            lines.append("    entries :=")
            lines.extend(body)
            lines.append("      ] }")
        else:
            lines.append("    entries := [] }")
        lines.append("")
    lines.append(f"noncomputable def healthcareR1CS : R1CS {field} :=")
    lines.append(f"  {{ nVars := {r1cs.n}")
    lines.append(f"    nCons := {r1cs.m}")
    lines.append(f"    nPub := {r1cs.l}")
    lines.append("    A := healthcareMatrixA")
    lines.append("    B := healthcareMatrixB")
    lines.append("    C := healthcareMatrixC")
    lines.append("    h_dim_A := by constructor <;> decide")
    lines.append("    h_dim_B := by constructor <;> decide")
    lines.append("    h_dim_C := by constructor <;> decide")
    lines.append("    h_pub_le := by decide }")
    lines.append("")
    lines.append(
        f"noncomputable def healthcareWitness : "
        f"Witness {field} healthcareR1CS.nVars"
    )
    for i, v in enumerate(witness):
        lines.append(f"  | ⟨{i}, _⟩ => {int(v) % q}")
    lines.append("")
    return "\n".join(lines)
