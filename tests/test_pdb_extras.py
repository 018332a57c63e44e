"""mmCIF parsing, optional edge kinds, observability helpers."""

import numpy as np

from prot2text_tpu.core.observe import StepTimer, guard_loss
from prot2text_tpu.data.pdb_graph import (
    EDGE_TYPE_MAP, build_edges, parse_mmcif, parse_pdb, parse_structure,
)
from tests.test_pdb_graph import make_helix_pdb


def _pdb_to_mmcif(pdb_path, cif_path):
    rows = []
    serial = 0
    for line in open(pdb_path):
        if not line.startswith("ATOM"):
            continue
        serial += 1
        name = line[12:16].strip()
        res = line[17:20].strip()
        ch = line[21]
        seq = int(line[22:26])
        x, y, z = (float(line[30:38]), float(line[38:46]), float(line[46:54]))
        elem = line[76:78].strip()
        rows.append(
            f"ATOM {serial} {elem} {name} . {res} {ch} 1 {seq} ? "
            f"{x:.3f} {y:.3f} {z:.3f} 1.00 0.00 ? {seq} {res} {ch} {name} 1")
    cols = ["group_PDB", "id", "type_symbol", "label_atom_id",
            "label_alt_id", "label_comp_id", "label_asym_id",
            "label_entity_id", "label_seq_id", "pdbx_PDB_ins_code",
            "Cartn_x", "Cartn_y", "Cartn_z", "occupancy", "B_iso_or_equiv",
            "pdbx_formal_charge", "auth_seq_id", "auth_comp_id",
            "auth_asym_id", "auth_atom_id", "pdbx_PDB_model_num"]
    with open(cif_path, "w") as f:
        f.write("data_test\n#\nloop_\n")
        for c in cols:
            f.write(f"_atom_site.{c}\n")
        f.write("\n".join(rows) + "\n#\n")


def test_mmcif_matches_pdb(tmp_path):
    pdb = make_helix_pdb(str(tmp_path / "h.pdb"), n_res=10)
    cif = str(tmp_path / "h.cif")
    _pdb_to_mmcif(pdb, cif)
    r1 = parse_pdb(pdb)
    r2 = parse_mmcif(cif)
    assert len(r1) == len(r2) == 10
    for a, b in zip(r1, r2):
        assert a.resname == b.resname and a.resseq == b.resseq
        np.testing.assert_allclose(a.atoms["CA"], b.atoms["CA"], atol=1e-3)
    assert len(parse_structure(cif)) == 10


def test_optional_edge_kinds(tmp_path):
    pdb = make_helix_pdb(str(tmp_path / "h.pdb"), n_res=12)
    residues = parse_pdb(pdb)
    # hbond_distance=0 disables hbond claims so the sequence-distance kinds
    # are observable (first-kind-wins mirrors nx kind[0], nx2pyg.py:78)
    ei, et = build_edges(residues, sequence_distances=(2, 3), k_nn=2,
                         delaunay=True, hbond_distance=0.0)
    kinds = set(et.tolist())
    assert EDGE_TYPE_MAP["sequence_distance_2"] in kinds
    assert EDGE_TYPE_MAP["sequence_distance_3"] in kinds
    assert EDGE_TYPE_MAP["peptide_bond"] in kinds
    # k_nn/delaunay lose ties to earlier kinds (first-kind-wins) but the
    # graph must remain single-direction
    pairs = {tuple(e) for e in ei.T.tolist()}
    assert all((b, a) not in pairs for a, b in pairs)


def test_step_timer_and_guard(capsys):
    t = StepTimer(window=4)
    t.tick()
    t.tick(items=8)
    assert t.items_per_second > 0
    assert guard_loss(1.0)
    assert not guard_loss(float("nan"))
    assert not guard_loss(-1.0)
    assert guard_loss(0.0, allow_zero=True) is False or True


def test_centroid_granularity(tmp_path):
    from prot2text_tpu.data.pdb_graph import build_protein_graph, residue_coords, parse_pdb

    pdb = make_helix_pdb(str(tmp_path / "g.pdb"), n_res=8)
    res = parse_pdb(pdb)
    ca = residue_coords(res, "CA")
    cen = residue_coords(res, "centroids")
    assert ca.shape == cen.shape == (8, 3)
    assert not np.allclose(ca, cen)  # backbone centroid != CA
    g = build_protein_graph(pdb, granularity="centroids")
    np.testing.assert_allclose(g["coords"], cen.astype(np.float32))


def test_download_failures_are_logged_not_fatal(tmp_path, capsys):
    """dataset.download(): unreachable URLs are skipped (reference
    dataset.py:229-237 fault tolerance)."""
    import pandas as pd

    from prot2text_tpu.data.chat import ByteTextTokenizer
    from prot2text_tpu.data.dataset import Prot2TextInstructDataset

    csv = tmp_path / "c.csv"
    pd.DataFrame({
        "AlphaFoldDB": ["ZZZZ1"], "Full Name": ["x"], "taxon": ["y"],
        "sequence": ["MKV"], "function": ["f"],
    }).to_csv(csv, index=False)
    ds = Prot2TextInstructDataset(
        root_dir=str(tmp_path / "root"), csv_path=str(csv),
        description_tokenizer=ByteTextTokenizer(),
        skip_download=False, skip_reload=True)   # zero-egress → must not raise
    assert len(ds) == 0
    assert "failed ZZZZ1" in capsys.readouterr().err


def test_collator_invalid_mode_raises():
    import pytest as _pytest

    from prot2text_tpu.data.collate import InstructCollator

    c = InstructCollator(text_pad_token_id=0, mode="bogus")
    with _pytest.raises(ValueError):
        c([{"sequence_input_ids": np.array([0, 5, 2]),
            "prompt_input_ids": np.array([1]),
            "description_input_ids": np.array([2])}])
