"""CLI surface for the kind-9 committed-witness mode (--witness-bind)."""

import json

from lambda_snark_tpu.cli import main as cli_main
from lambda_snark_tpu.core.params import NTT_MODULUS


def test_cli_witness_bind_roundtrip(tmp_path):
    circuit = {
        "m": 4, "n": 4, "l": 2, "modulus": NTT_MODULUS,
        "constraints": [
            {
                "A": [{"row": i, "col": 1, "value": 1}],
                "B": [{"row": i, "col": 2, "value": 1}],
                "C": [{"row": i, "col": 3, "value": 1}],
            }
            for i in range(4)
        ],
    }
    cpath = tmp_path / "circuit.json"
    wpath = tmp_path / "witness.json"
    ppath = tmp_path / "proof.bin"
    cpath.write_text(json.dumps(circuit))
    wpath.write_text("[1, 7, 13, 91]")
    base = ["--ring-degree", "64"]
    rc = cli_main(base + [
        "prove", "--circuit", str(cpath), "--witness", str(wpath),
        "--witness-bind", "--out", str(ppath),
    ])
    assert rc == 0 and ppath.exists()
    rc = cli_main(base + [
        "verify", "--circuit", str(cpath), "--proof", str(ppath),
        "--public", "1,7",
    ])
    assert rc == 0
    rc = cli_main(base + [
        "verify", "--circuit", str(cpath), "--proof", str(ppath),
        "--public", "1,8",
    ])
    assert rc == 1
    # zk variant
    zpath = tmp_path / "proof_zk.bin"
    rc = cli_main(base + [
        "prove", "--circuit", str(cpath), "--witness", str(wpath),
        "--witness-bind", "--zk", "--blinding-seed", "7",
        "--out", str(zpath),
    ])
    assert rc == 0
    rc = cli_main(base + [
        "verify", "--circuit", str(cpath), "--proof", str(zpath),
        "--public", "1,7",
    ])
    assert rc == 0
