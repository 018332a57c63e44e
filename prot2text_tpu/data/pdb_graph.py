"""Native PDB → residue-graph featurization (no graphein / external dssp).

Produces the reference's data-format contracts exactly (nx2pyg.py:10-20,
:68-78):
  * x = [aa_idx ‖ phi ‖ psi ‖ rsa ‖ asa ‖ ss_8class ‖ expasy...] per residue
  * edge_index (2, E) single-direction edges, edge_type ∈ 7-relation map
    {peptide_bond:0, sequence_distance_2:1, sequence_distance_3:2,
     distance_threshold:3, delaunay:4, hbond:5, k_nn:6}
  * default edge set = peptide bonds + hydrogen bonds + 10 Å distance
    threshold with sequence separation > 3 (utils_dataset.py:19-36)

The reference delegates the geometry features to graphein + the external
`dssp` C++ binary (README.md:31-35).  Here they are computed natively:
  * phi/psi backbone dihedrals (DSSP degree convention, 360.0 undefined)
  * ASA via Shrake-Rupley sphere sampling; RSA = ASA / Sander-Rost max-acc
  * 8-class secondary structure via the Kabsch-Sander hydrogen-bond energy
    model (H/B/E/G/I/T/S assignment)
A C++ acceleration of the O(N·atoms) inner loops lives in native/featurize.cc
(loaded via ctypes when built); this module is the reference implementation
and fallback.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional

import numpy as np

# graphein's amino_acid_one_hot vocabulary order (alphabetical 3-letter std.)
STANDARD_AA = ["ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS",
               "ILE", "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP",
               "TYR", "VAL"]
AA_INDEX = {a: i for i, a in enumerate(STANDARD_AA)}
THREE_TO_ONE = dict(zip(STANDARD_AA, "ARNDCQEGHILKMFPSTWYV"))

SS_MAP = {"-": 0, "H": 1, "B": 2, "E": 3, "G": 4, "I": 5, "T": 6, "S": 7}
EDGE_TYPE_MAP = {
    "peptide_bond": 0, "sequence_distance_2": 1, "sequence_distance_3": 2,
    "distance_threshold": 3, "delaunay": 4, "hbond": 5, "k_nn": 6,
}

# Sander & Rost (1994) maximum accessible surface areas (Å²)
MAX_ACC = {
    "ALA": 106.0, "ARG": 248.0, "ASN": 157.0, "ASP": 163.0, "CYS": 135.0,
    "GLN": 198.0, "GLU": 194.0, "GLY": 84.0, "HIS": 184.0, "ILE": 169.0,
    "LEU": 164.0, "LYS": 205.0, "MET": 188.0, "PHE": 197.0, "PRO": 136.0,
    "SER": 130.0, "THR": 142.0, "TRP": 227.0, "TYR": 222.0, "VAL": 142.0,
}

VDW_RADII = {"C": 1.70, "N": 1.55, "O": 1.52, "S": 1.80, "H": 1.20,
             "P": 1.80}

# Full 61-scale ExPASy table (graphein `expasy_protein_scale` parity):
# 4 physicochemical rows + the 57 ProtScale scales, in graphein column
# order — see data/expasy.py for the documented column map.  x width is
# therefore 1 (aa) + 5 (phi,psi,rsa,asa,ss) + 61 = 67, matching datasets
# preprocessed by the reference (nx2pyg.py:68-77).
from .expasy import (  # noqa: E402
    AA_ORDER as _EXPASY_AA_ORDER,
    EXPASY_SCALE_NAMES,
    N_EXPASY_SCALES,
    expasy_block,
)

# residue-level hydrogen-bond donor/acceptor side-chain heavy atoms
# (backbone N/O always participate) — graphein HYDROGEN_BOND_* equivalents
HBOND_DONOR_ATOMS = {
    "ARG": ["NE", "NH1", "NH2"], "ASN": ["ND2"], "GLN": ["NE2"],
    "HIS": ["ND1", "NE2"], "LYS": ["NZ"], "SER": ["OG"], "THR": ["OG1"],
    "TRP": ["NE1"], "TYR": ["OH"], "CYS": ["SG"],
}
HBOND_ACCEPTOR_ATOMS = {
    "ASN": ["OD1"], "ASP": ["OD1", "OD2"], "GLN": ["OE1"],
    "GLU": ["OE1", "OE2"], "HIS": ["ND1", "NE2"], "SER": ["OG"],
    "THR": ["OG1"], "TYR": ["OH"], "MET": ["SD"], "CYS": ["SG"],
}


@dataclasses.dataclass
class Residue:
    resname: str
    chain: str
    resseq: int
    atoms: Dict[str, np.ndarray]          # atom name → xyz
    elements: Dict[str, str]


def parse_pdb(path: str, chain: Optional[str] = None) -> List[Residue]:
    """Minimal PDB parser: ATOM records, first altloc, first model,
    deprotonated (hydrogens dropped — reference pdb2nx.py:117-130)."""
    residues: Dict[tuple, Residue] = {}
    with open(path) as f:
        for line in f:
            if line.startswith("ENDMDL"):
                break
            if not line.startswith("ATOM"):
                continue
            altloc = line[16]
            if altloc not in (" ", "A"):
                continue
            name = line[12:16].strip()
            resname = line[17:20].strip()
            ch = line[21]
            if chain is not None and ch != chain:
                continue
            if line[26] != " ":       # insertion codes removed (pdb2nx:170)
                continue
            resseq = int(line[22:26])
            element = (line[76:78].strip() or name[:1]).upper()
            if element == "H" or element == "D":
                continue
            xyz = np.array([float(line[30:38]), float(line[38:46]),
                            float(line[46:54])])
            key = (ch, resseq)
            if key not in residues:
                residues[key] = Residue(resname, ch, resseq, {}, {})
            if name not in residues[key].atoms:
                residues[key].atoms[name] = xyz
                residues[key].elements[name] = element
    out = [r for r in residues.values()
           if r.resname in AA_INDEX and "CA" in r.atoms]
    out.sort(key=lambda r: (r.chain, r.resseq))
    return out


def parse_mmcif(path: str, chain: Optional[str] = None) -> List[Residue]:
    """Minimal mmCIF `_atom_site` loop parser — the reference remaps mmCIF
    columns into the PDB dataframe layout (utils_pdb2nx.py:59-84); here we
    build Residues directly.  First model, first altloc, hydrogens dropped."""
    residues: Dict[tuple, Residue] = {}
    cols: List[str] = []
    in_loop = False
    with open(path) as f:
        for line in f:
            s = line.strip()
            if s.startswith("_atom_site."):
                cols.append(s.split(".", 1)[1].strip())
                in_loop = True
                continue
            if in_loop:
                if s.startswith(("_", "loop_", "#")) or not s:
                    if cols and not s.startswith("_atom_site."):
                        in_loop = False
                    continue
                parts = s.split()
                if len(parts) < len(cols):
                    continue
                row = dict(zip(cols, parts))
                if row.get("group_PDB", "ATOM") != "ATOM":
                    continue
                if row.get("pdbx_PDB_model_num", "1") not in ("1", "."):
                    continue
                alt = row.get("label_alt_id", ".")
                if alt not in (".", "A", "?"):
                    continue
                elem = row.get("type_symbol", "").upper()
                if elem in ("H", "D"):
                    continue
                ch = row.get("auth_asym_id", row.get("label_asym_id", "A"))
                if chain is not None and ch != chain:
                    continue
                try:
                    resseq = int(row.get("auth_seq_id",
                                         row.get("label_seq_id", "0")))
                except ValueError:
                    continue
                name = row.get("auth_atom_id",
                               row.get("label_atom_id", "")).strip('"')
                resname = row.get("auth_comp_id",
                                  row.get("label_comp_id", ""))
                xyz = np.array([float(row["Cartn_x"]), float(row["Cartn_y"]),
                                float(row["Cartn_z"])])
                key = (ch, resseq)
                if key not in residues:
                    residues[key] = Residue(resname, ch, resseq, {}, {})
                if name not in residues[key].atoms:
                    residues[key].atoms[name] = xyz
                    residues[key].elements[name] = elem
    out = [r for r in residues.values()
           if r.resname in AA_INDEX and "CA" in r.atoms]
    out.sort(key=lambda r: (r.chain, r.resseq))
    return out


def parse_structure(path: str, chain: Optional[str] = None) -> List[Residue]:
    """Dispatch on extension: .pdb → parse_pdb, .cif/.mmcif → parse_mmcif
    (reference pdb2nx.py:76-77 mmCIF path)."""
    if path.endswith((".cif", ".mmcif")):
        return parse_mmcif(path, chain)
    return parse_pdb(path, chain)


# ---------------------------------------------------------------------------
# geometry


def _dihedral(p0, p1, p2, p3) -> float:
    """Signed dihedral in degrees."""
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    b1n = b1 / np.linalg.norm(b1)
    v = b0 - np.dot(b0, b1n) * b1n
    w = b2 - np.dot(b2, b1n) * b1n
    x = np.dot(v, w)
    y = np.dot(np.cross(b1n, v), w)
    return math.degrees(math.atan2(y, x))


def phi_psi(residues: List[Residue]):
    """DSSP convention: 360.0 where undefined (chain termini/missing)."""
    n = len(residues)
    phi = np.full(n, 360.0)
    psi = np.full(n, 360.0)

    def chained(i, j):
        return (residues[i].chain == residues[j].chain
                and residues[j].resseq - residues[i].resseq == 1)

    for i, r in enumerate(residues):
        a = r.atoms
        if i > 0 and chained(i - 1, i):
            p = residues[i - 1].atoms
            if all(k in p for k in ("C",)) and all(
                    k in a for k in ("N", "CA", "C")):
                phi[i] = _dihedral(p["C"], a["N"], a["CA"], a["C"])
        if i + 1 < n and chained(i, i + 1):
            q = residues[i + 1].atoms
            if all(k in a for k in ("N", "CA", "C")) and "N" in q:
                psi[i] = _dihedral(a["N"], a["CA"], a["C"], q["N"])
    return phi, psi


# ---------------------------------------------------------------------------
# Shrake-Rupley ASA


def _sphere_points(n: int) -> np.ndarray:
    """Golden-spiral unit sphere points."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = math.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(phi)], axis=1)


def shrake_rupley_asa(residues: List[Residue], n_points: int = 100,
                      probe: float = 1.4) -> np.ndarray:
    """Per-residue solvent-accessible surface area (Å²)."""
    coords, radii, owner = [], [], []
    for ri, r in enumerate(residues):
        for name, xyz in r.atoms.items():
            coords.append(xyz)
            radii.append(VDW_RADII.get(r.elements[name], 1.70) + probe)
            owner.append(ri)
    coords = np.asarray(coords)
    radii = np.asarray(radii)
    owner = np.asarray(owner)
    try:
        from .native import sasa as native_sasa

        atom_areas = native_sasa(coords, radii, n_points)
    except Exception:
        atom_areas = _sasa_numpy(coords, radii, n_points)
    asa = np.zeros(len(residues))
    np.add.at(asa, owner, atom_areas)
    return asa


def _sasa_numpy(coords, radii, n_points):
    sphere = _sphere_points(n_points)
    n_atoms = len(coords)
    areas = np.zeros(n_atoms)
    # neighbor prefilter
    from scipy.spatial import cKDTree

    tree = cKDTree(coords)
    max_r = radii.max()
    for i in range(n_atoms):
        nbrs = tree.query_ball_point(coords[i], radii[i] + max_r)
        nbrs = [j for j in nbrs if j != i]
        pts = coords[i] + sphere * radii[i]
        if nbrs:
            d = np.linalg.norm(
                pts[:, None, :] - coords[np.asarray(nbrs)][None], axis=2)
            buried = (d < radii[np.asarray(nbrs)][None]).any(axis=1)
        else:
            buried = np.zeros(len(pts), bool)
        frac = 1.0 - buried.mean()
        areas[i] = 4.0 * math.pi * radii[i] ** 2 * frac
    return areas


# ---------------------------------------------------------------------------
# Kabsch-Sander secondary structure


def _backbone_hbonds(residues: List[Residue]) -> np.ndarray:
    """(N, N) bool: hbond[i, j] = True if N-H(i) … O=C(j) with
    Kabsch-Sander energy < -0.5 kcal/mol."""
    n = len(residues)
    E = np.full((n, n), 0.0)
    # H position: N_i + unit(C_{i-1} - O_{i-1})
    H = {}
    for i in range(1, n):
        r, p = residues[i], residues[i - 1]
        if (r.chain == p.chain and r.resname != "PRO"
                and "N" in r.atoms and "C" in p.atoms and "O" in p.atoms):
            co = p.atoms["C"] - p.atoms["O"]
            H[i] = r.atoms["N"] + co / np.linalg.norm(co)
    q1q2f = 0.084 * 332.0
    hb = np.zeros((n, n), bool)
    for i in range(n):
        if i not in H or "N" not in residues[i].atoms:
            continue
        Ni = residues[i].atoms["N"]
        Hi = H[i]
        for j in range(n):
            if abs(i - j) < 2:
                continue
            aj = residues[j].atoms
            if "C" not in aj or "O" not in aj:
                continue
            rON = np.linalg.norm(Ni - aj["O"])
            rCH = np.linalg.norm(Hi - aj["C"])
            rOH = np.linalg.norm(Hi - aj["O"])
            rCN = np.linalg.norm(Ni - aj["C"])
            if rON > 5.2:            # distance cutoff for speed
                continue
            if min(rON, rCH, rOH, rCN) < 0.5:
                e = -9.9
            else:
                e = q1q2f * (1 / rON + 1 / rCH - 1 / rOH - 1 / rCN)
            E[i, j] = e
            if e < -0.5:
                hb[i, j] = True
    return hb


def secondary_structure(residues: List[Residue]) -> List[str]:
    """DSSP 8-class assignment (H,B,E,G,I,T,S,-) from backbone H-bonds."""
    n = len(residues)
    hb = _backbone_hbonds(residues)          # hb[donor_i, acceptor_j]

    def turn(i, k):  # k-turn at i: CO(i) … HN(i+k)
        return i + k < n and hb[i + k, i]

    ss = ["-"] * n

    # bends (S): kappa > 70 deg
    ca = [r.atoms["CA"] for r in residues]
    for i in range(2, n - 2):
        u = ca[i] - ca[i - 2]
        v = ca[i + 2] - ca[i]
        cosang = np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v))
        kappa = math.degrees(math.acos(np.clip(cosang, -1, 1)))
        if kappa > 70.0:
            ss[i] = "S"

    # turns (T)
    for k in (3, 4, 5):
        for i in range(n):
            if turn(i, k):
                for j in range(i + 1, min(i + k, n)):
                    if ss[j] == "-" or ss[j] == "S":
                        ss[j] = "T"

    # bridges / strands
    def bridge(i, j):
        para = ((i > 0 and hb[j, i - 1] and i + 1 < n and hb[i + 1, j])
                or (j > 0 and hb[i, j - 1] and j + 1 < n and hb[j + 1, i]))
        anti = ((hb[i, j] and hb[j, i])
                or (i > 0 and j + 1 < n and hb[j + 1, i - 1]
                    and i + 1 < n and j > 0 and hb[i + 1, j - 1]))
        return para or anti

    bridges = np.zeros((n,), bool)
    partner = [[] for _ in range(n)]
    for i in range(1, n - 1):
        for j in range(i + 3, n - 1):
            if bridge(i, j):
                bridges[i] = bridges[j] = True
                partner[i].append(j)
                partner[j].append(i)
    for i in range(n):
        if bridges[i]:
            extended = any(
                bridges[k] and any(abs(pj - pk) <= 1 for pj in partner[i]
                                   for pk in partner[k])
                for k in (i - 1, i + 1) if 0 <= k < n)
            ss[i] = "E" if extended else "B"

    # helices (G=3-turn, H=4-turn, I=5-turn); H has priority
    for k, code in ((4, "H"), (3, "G"), (5, "I")):
        for i in range(1, n):
            if turn(i, k) and turn(i - 1, k):
                for j in range(i, min(i + k, n)):
                    if code == "H" or ss[j] in ("-", "T", "S"):
                        ss[j] = code
    return ss


# ---------------------------------------------------------------------------
# edges


def residue_coords(residues: List[Residue],
                   granularity: str = "CA") -> np.ndarray:
    """Node coordinates: "CA" (default) or "centroids" — the mean of each
    residue's heavy atoms (reference granularity subsetting,
    pdb2nx.py:133-167, :478-499)."""
    if granularity == "CA":
        return np.asarray([r.atoms["CA"] for r in residues])
    if granularity == "centroids":
        return np.asarray([
            np.mean(list(r.atoms.values()), axis=0) for r in residues])
    raise ValueError(f"unknown granularity {granularity!r}")


def build_edges(residues: List[Residue], distance_threshold: float = 10.0,
                long_interaction_threshold: int = 3,
                hbond_distance: float = 3.5,
                sequence_distances: tuple = (),
                k_nn: int = 0,
                delaunay: bool = False,
                granularity: str = "CA"):
    """Default reference edge set (utils_dataset.py:27-31): peptide bonds,
    residue-level hydrogen bonds, CA distance threshold with |i-j| >
    long_interaction_threshold.  The remaining kinds of the 7-relation map
    (nx2pyg.py:12-20) are available via flags: sequence_distances=(2, 3)
    adds sequence_distance_2/3 edges, k_nn adds k-nearest-CA edges, delaunay
    adds Delaunay-tessellation edges.  Each undirected edge appears ONCE
    (nx → PyG single-direction convention, nx2pyg.py:32)."""
    n = len(residues)
    edges: Dict[tuple, int] = {}

    def add(i, j, t):
        key = (min(i, j), max(i, j))
        # first kind wins, matching nx kind[0] selection (nx2pyg.py:78)
        if key not in edges:
            edges[key] = t

    # peptide bonds
    for i in range(n - 1):
        if (residues[i].chain == residues[i + 1].chain
                and residues[i + 1].resseq - residues[i].resseq == 1):
            add(i, i + 1, EDGE_TYPE_MAP["peptide_bond"])

    # hydrogen bonds: backbone N/O + sidechain donor/acceptor atoms
    donor_sets, acceptor_sets = [], []
    for r in residues:
        d = [r.atoms["N"]] if "N" in r.atoms else []
        d += [r.atoms[a] for a in HBOND_DONOR_ATOMS.get(r.resname, [])
              if a in r.atoms]
        a_ = [r.atoms["O"]] if "O" in r.atoms else []
        a_ += [r.atoms[a] for a in HBOND_ACCEPTOR_ATOMS.get(r.resname, [])
               if a in r.atoms]
        donor_sets.append(np.asarray(d) if d else np.zeros((0, 3)))
        acceptor_sets.append(np.asarray(a_) if a_ else np.zeros((0, 3)))
    ca = residue_coords(residues, granularity)
    from scipy.spatial import cKDTree

    tree = cKDTree(ca)
    pairs = tree.query_pairs(2 * 10.0)
    for i, j in pairs:
        if abs(i - j) < 2:
            continue
        close = False
        for d, a_ in ((donor_sets[i], acceptor_sets[j]),
                      (donor_sets[j], acceptor_sets[i])):
            if len(d) and len(a_):
                dist = np.linalg.norm(d[:, None] - a_[None], axis=2)
                if (dist < hbond_distance).any():
                    close = True
                    break
        if close:
            add(i, j, EDGE_TYPE_MAP["hbond"])

    # distance threshold on CA with sequence separation
    for i, j in pairs:
        if (abs(i - j) > long_interaction_threshold
                and np.linalg.norm(ca[i] - ca[j]) < distance_threshold):
            add(i, j, EDGE_TYPE_MAP["distance_threshold"])

    # optional kinds completing the 7-relation map
    for d in sequence_distances:
        kind = EDGE_TYPE_MAP[f"sequence_distance_{d}"]
        for i in range(n - d):
            if (residues[i].chain == residues[i + d].chain
                    and residues[i + d].resseq - residues[i].resseq == d):
                add(i, i + d, kind)
    if k_nn > 0:
        k = min(k_nn + 1, n)
        _, nbr = tree.query(ca, k=k)
        for i in range(n):
            for j in np.atleast_1d(nbr[i])[1:]:
                add(i, int(j), EDGE_TYPE_MAP["k_nn"])
    if delaunay and n >= 5:
        from scipy.spatial import Delaunay as _Delaunay

        tri = _Delaunay(ca)
        for simplex in tri.simplices:
            for a_i in range(4):
                for b_i in range(a_i + 1, 4):
                    add(int(simplex[a_i]), int(simplex[b_i]),
                        EDGE_TYPE_MAP["delaunay"])

    if not edges:
        return np.zeros((2, 0), np.int64), np.zeros((0,), np.int64)
    keys = sorted(edges)
    ei = np.asarray(keys).T
    et = np.asarray([edges[k] for k in keys])
    return ei, et


# ---------------------------------------------------------------------------


def expasy_features(residues: List[Residue]) -> np.ndarray:
    one = [THREE_TO_ONE[r.resname] for r in residues]
    return expasy_block(one)  # (N, 61) in graphein column order


def build_protein_graph(pdb_path: str, chain: Optional[str] = None,
                        n_sasa_points: int = 100,
                        granularity: str = "CA") -> Dict[str, np.ndarray]:
    """Full featurization: returns {x, edge_index, edge_type, coords,
    distance_matrix, distance, node_id, sequence} with the nx2pyg layout
    and record fields (reference nx2pyg.py:57-66 keeps distance_matrix,
    coordinates, node_id and per-edge distance).  Accepts .pdb or
    .cif/.mmcif."""
    residues = parse_structure(pdb_path, chain)
    if not residues:
        raise ValueError(f"no standard residues parsed from {pdb_path}")
    aa_idx = np.asarray([AA_INDEX[r.resname] for r in residues], np.float64)
    phi, psi = phi_psi(residues)
    asa = shrake_rupley_asa(residues, n_sasa_points)
    rsa = asa / np.asarray([MAX_ACC[r.resname] for r in residues])
    ss = secondary_structure(residues)
    ss_idx = np.asarray([SS_MAP.get(s, 0) for s in ss], np.float64)
    expasy = expasy_features(residues)

    x = np.concatenate([
        aa_idx[:, None], phi[:, None], psi[:, None], rsa[:, None],
        asa[:, None], ss_idx[:, None], expasy], axis=1)
    edge_index, edge_type = build_edges(residues, granularity=granularity)
    coords = residue_coords(residues, granularity)
    # full pairwise CA distance matrix (reference keeps graphein's dist_mat
    # as Data.distance_matrix, nx2pyg.py:63) + per-edge distances (:44)
    dist_mat = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=2)
    edge_dist = (dist_mat[edge_index[0], edge_index[1]]
                 if edge_index.shape[1] else np.zeros((0,), np.float64))
    node_id = np.asarray([
        f"{r.chain}:{r.resname}:{r.resseq}" for r in residues])
    seq = "".join(THREE_TO_ONE[r.resname] for r in residues)
    return {
        "x": x.astype(np.float32),
        "edge_index": edge_index.astype(np.int64),
        "edge_type": edge_type.astype(np.int64),
        "coords": coords.astype(np.float32),
        "distance_matrix": dist_mat.astype(np.float32),
        "distance": edge_dist.astype(np.float32),
        "node_id": node_id,
        "sequence": seq,
    }
