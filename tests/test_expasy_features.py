"""Node-feature contract tests: full graphein/ExPASy parity (VERDICT #3).

The reference's persisted x matrix is
x = [argmax(aa_one_hot), phi, psi, rsa, asa, ss_8class] ++ expasy(61)
(reference nx2pyg.py:68-77, graph config utils_dataset.py:19-36), total
width 67.  Datasets preprocessed by either pipeline must be width- and
order-compatible.
"""

import numpy as np

from prot2text_tpu.data.expasy import (
    AA_ORDER, EXPASY_MATRIX, EXPASY_SCALE_NAMES, N_EXPASY_SCALES,
    expasy_block,
)


def test_table_shape_and_order():
    assert N_EXPASY_SCALES == 61
    assert EXPASY_MATRIX.shape == (61, 20)
    assert len(AA_ORDER) == 20 and len(set(AA_ORDER)) == 20
    # graphein row order: 4 physicochemical rows first, then ProtScale
    assert EXPASY_SCALE_NAMES[:4] == [
        "pka_cooh_alpha", "pka_nh3", "pka_rgroup", "isoelectric_points"]
    assert EXPASY_SCALE_NAMES[4] == "molecularweight"
    assert EXPASY_SCALE_NAMES[-1] == "relativemutability"
    assert len(set(EXPASY_SCALE_NAMES)) == 61  # no duplicate rows


def test_known_scale_values():
    # spot-check canonical published values
    def val(scale, aa):
        return EXPASY_MATRIX[EXPASY_SCALE_NAMES.index(scale),
                             AA_ORDER.index(aa)]

    assert val("hphob_doolittle", "I") == 4.5      # Kyte-Doolittle Ile
    assert val("hphob_doolittle", "R") == -4.5
    assert val("bulkiness", "G") == 3.40           # Zimmerman Gly
    assert val("alpha_helixfasman", "P") == 0.57   # Chou-Fasman Pro
    assert val("numbercodons", "M") == 1
    assert val("molecularweight", "W") == 204.0
    assert val("relativemutability", "W") == 18


def test_expasy_block_layout():
    blk = expasy_block("ACD")
    assert blk.shape == (3, 61)
    # row 0 is Ala across all scales, in table order
    np.testing.assert_array_equal(blk[0], EXPASY_MATRIX[:, 0])
    np.testing.assert_array_equal(blk[1], EXPASY_MATRIX[:, AA_ORDER.index("C")])


def test_x_width_and_record_fields(tmp_path):
    from prot2text_tpu.data.pdb_graph import build_protein_graph
    from tests.test_pdb_graph import make_helix_pdb

    pdb = str(tmp_path / "h.pdb")
    make_helix_pdb(pdb, n_res=12)
    g = build_protein_graph(pdb)
    assert g["x"].shape == (12, 67)  # 1 + 5 + 61
    # expasy block within x matches the table directly (all-ALA helix)
    np.testing.assert_allclose(
        g["x"][:, 6:], np.tile(EXPASY_MATRIX[:, 0], (12, 1)), rtol=1e-6)
    # full record fields the reference persists (nx2pyg.py:57-66)
    assert g["coords"].shape == (12, 3)
    assert g["distance_matrix"].shape == (12, 12)
    np.testing.assert_allclose(np.diag(g["distance_matrix"]), 0, atol=1e-5)
    E = g["edge_index"].shape[1]
    assert g["distance"].shape == (E,)
    # per-edge distance consistent with the matrix
    np.testing.assert_allclose(
        g["distance"],
        g["distance_matrix"][g["edge_index"][0], g["edge_index"][1]],
        rtol=1e-5)
    assert len(g["node_id"]) == 12 and g["node_id"][0].startswith("A:ALA:")


def test_dataset_persists_record_fields(tmp_path):
    import pandas as pd

    from prot2text_tpu.data.chat import ByteTextTokenizer
    from prot2text_tpu.data.dataset import Prot2TextInstructDataset
    from tests.test_pdb_graph import make_helix_pdb

    csv = tmp_path / "d.csv"
    pd.DataFrame({
        "AlphaFoldDB": ["X00001"], "Full Name": ["Toy"],
        "taxon": ["Homo sapiens"], "sequence": ["MKV"],
        "function": ["Does things."],
    }).to_csv(csv, index=False)
    ds = Prot2TextInstructDataset(
        root_dir=str(tmp_path / "root"), csv_path=str(csv),
        description_tokenizer=ByteTextTokenizer(),
        skip_download=True, skip_reload=True)
    make_helix_pdb(ds.raw_path("X00001"), n_res=8)
    ds.process_one("X00001")
    ds.update_usable_file_names()
    rec = ds[0]
    assert rec["x"].shape[1] == 67
    assert rec["coords"].shape == (8, 3)
    assert rec["distance_matrix"].shape == (8, 8)
    assert rec["distance"].shape[0] == rec["edge_index"].shape[1]
    assert rec["node_id"].shape == (8,)
