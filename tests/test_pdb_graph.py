"""PDB→graph featurization tests on a synthetic ideal α-helix.

Builds poly-alanine backbone coordinates with NeRF from standard internal
coordinates (phi=-57, psi=-47), writes a PDB, and checks the native pipeline
recovers the dihedrals, helical secondary structure, sensible ASA/RSA, and
the reference edge/feature contracts (nx2pyg.py:10-20, :68-78)."""

import math
import os

import numpy as np
import pytest

from prot2text_tpu.data.pdb_graph import (
    EDGE_TYPE_MAP, build_protein_graph, parse_pdb, phi_psi,
    secondary_structure, shrake_rupley_asa,
)


def _place(a, b, c, bond, angle_deg, dihedral_deg):
    """NeRF: position D given A-B-C and internal coords of C-D."""
    angle = math.radians(angle_deg)
    dihedral = math.radians(dihedral_deg)
    bc = c - b
    bc /= np.linalg.norm(bc)
    ab = b - a
    n = np.cross(ab, bc)
    n /= np.linalg.norm(n)
    m = np.cross(n, bc)
    d2 = np.array([
        -bond * math.cos(angle),
        bond * math.sin(angle) * math.cos(dihedral),
        bond * math.sin(angle) * math.sin(dihedral),
    ])
    return c + d2[0] * bc + d2[1] * m + d2[2] * n


def make_helix_pdb(path, n_res=16, phi=-57.0, psi=-47.0):
    # seed backbone
    N = [np.array([0.0, 0.0, 0.0])]
    CA = [np.array([1.458, 0.0, 0.0])]
    C = [CA[0] + np.array([0.55, 1.42, 0.0])]
    O = []
    for i in range(1, n_res):
        Ni = _place(N[-1], CA[-1], C[-1], 1.329, 116.2, psi)
        CAi = _place(CA[-1], C[-1], Ni, 1.458, 121.7, 180.0)  # omega
        Ci = _place(C[-1], Ni, CAi, 1.525, 111.2, phi)
        N.append(Ni)
        CA.append(CAi)
        C.append(Ci)
    for i in range(n_res):
        if i + 1 < n_res:
            O.append(_place(N[i + 1], CA[i], C[i], 1.231, 120.5, 180.0))
        else:
            O.append(_place(N[i], CA[i], C[i], 1.231, 120.5, 0.0))

    with open(path, "w") as f:
        serial = 1
        for i in range(n_res):
            for name, xyz, elem in (("N", N[i], "N"), ("CA", CA[i], "C"),
                                    ("C", C[i], "C"), ("O", O[i], "O")):
                f.write(
                    f"ATOM  {serial:5d} {name:^4s} ALA A{i + 1:4d}    "
                    f"{xyz[0]:8.3f}{xyz[1]:8.3f}{xyz[2]:8.3f}"
                    f"  1.00  0.00          {elem:>2s}\n")
                serial += 1
        f.write("END\n")
    return path


@pytest.fixture(scope="module")
def helix_pdb(tmp_path_factory):
    return make_helix_pdb(
        str(tmp_path_factory.mktemp("pdb") / "helix.pdb"))


def test_parse_and_dihedrals(helix_pdb):
    residues = parse_pdb(helix_pdb)
    assert len(residues) == 16
    phi, psi = phi_psi(residues)
    # termini undefined
    assert phi[0] == 360.0 and psi[-1] == 360.0
    np.testing.assert_allclose(phi[1:], -57.0, atol=1.0)
    np.testing.assert_allclose(psi[:-1], -47.0, atol=1.0)


def test_secondary_structure_is_helix(helix_pdb):
    residues = parse_pdb(helix_pdb)
    ss = secondary_structure(residues)
    # interior of an ideal alpha helix must be H
    interior = ss[4:12]
    assert all(s == "H" for s in interior), ss


def test_asa_native_matches_numpy(helix_pdb):
    from prot2text_tpu.data import pdb_graph as pg

    residues = parse_pdb(helix_pdb)
    coords, radii = [], []
    for r in residues:
        for name, xyz in r.atoms.items():
            coords.append(xyz)
            radii.append(pg.VDW_RADII.get(r.elements[name], 1.70) + 1.4)
    coords = np.asarray(coords)
    radii = np.asarray(radii)
    ref = pg._sasa_numpy(coords, radii, 100)
    try:
        from prot2text_tpu.data.native import sasa

        fast = sasa(coords, radii, 100)
    except OSError:
        pytest.skip("native lib not built")
    np.testing.assert_allclose(fast, ref, atol=1e-6)


def test_build_protein_graph_contracts(helix_pdb):
    g = build_protein_graph(helix_pdb)
    n = 16
    # x layout: aa_idx, phi, psi, rsa, asa, ss, expasy(61) — width 67
    # matches the reference (nx2pyg.py:68-77 with graphein's full table)
    assert g["x"].shape == (n, 67)
    assert (g["x"][:, 0] == 0).all()  # ALA index 0
    assert (g["x"][:, 3] >= 0).all() and (g["x"][:, 3] <= 1.5).all()  # rsa
    assert (g["x"][:, 4] > 0).any()  # asa positive somewhere
    assert g["sequence"] == "A" * n
    # peptide bonds exist for every consecutive pair
    et = g["edge_type"]
    ei = g["edge_index"]
    pep = ei[:, et == EDGE_TYPE_MAP["peptide_bond"]]
    assert pep.shape[1] == n - 1
    # helix i,i+4 backbone hbonds → hbond edges present
    assert (et == EDGE_TYPE_MAP["hbond"]).sum() > 0
    # 10 Å threshold edges with |i-j| > 3
    dth = ei[:, et == EDGE_TYPE_MAP["distance_threshold"]]
    assert dth.shape[1] > 0
    assert (np.abs(dth[0] - dth[1]) > 3).all()
    # single-direction edges only
    pairs = {tuple(e) for e in ei.T.tolist()}
    assert all((b, a) not in pairs for a, b in pairs)


def test_collate_graphs_flat_space(helix_pdb):
    from prot2text_tpu.data.collate_graph import collate_graphs

    g = build_protein_graph(helix_pdb)
    S = 20  # padded protein token length (bos + 16 + eos + pad)
    out = collate_graphs([g, g], seq_len=S, edge_budget=256)
    ei, et, em = out["edge_index"], out["edge_type"], out["edge_mask"]
    assert ei.shape == (2, 256) and em.sum() == 2 * g["edge_index"].shape[1]
    real = ei[:, em.astype(bool)]
    # batch 0 nodes in [1, 17), batch 1 nodes in [S+1, S+17)
    n_e = g["edge_index"].shape[1]
    assert real[:, :n_e].min() >= 1 and real[:, :n_e].max() <= 16
    assert real[:, n_e:].min() >= S + 1 and real[:, n_e:].max() <= S + 16
