"""Full ExPASy amino-acid scale table — graphein `expasy_protein_scale` parity.

The reference pipeline attaches graphein's full ExPASy block to every residue
node (reference dataset/utils_dataset.py:19-26) and concatenates it into the
persisted node-feature matrix `x = [aa_idx, phi, psi, rsa, asa, ss, expasy]`
(reference dataset/nx2pyg.py:68-77).  Graphein's `amino_acid_properties.csv`
carries 61 rows: 4 physicochemical constants (pKa/pI) followed by the 57
scales of the ExPASy ProtScale collection, giving x a total width of
1 + 5 + 61 = 67 columns.

This module ships that table as plain data (published scientific constants —
Zimmerman, Kyte-Doolittle, Chou-Fasman, Deleage-Roux, Levitt, ...).  Values
are transcribed from the published tables; the scales are carried as a
data-format contract (nothing in the model stack consumes them numerically —
the RGCN adapter runs on ESM embeddings), so column COUNT and ORDER are the
binding contract, with per-value fidelity best-effort for the more obscure
chromatographic scales.

Column map (index within the expasy block; add 6 for the index within x):
  0  pka_cooh_alpha            alpha-COOH dissociation constant
  1  pka_nh3                   alpha-NH3+ dissociation constant
  2  pka_rgroup                side-chain dissociation constant (7.0 = none)
  3  isoelectric_points        pI
  4  molecularweight           Molecular weight
  5  numbercodons              Number of codon(s)
  6  bulkiness                 Bulkiness (Zimmerman)
  7  polarityzimmerman         Polarity (Zimmerman)
  8  polaritygrantham          Polarity (Grantham)
  9  refractivity              Refractivity (Jones)
  10 recognitionfactors        Recognition factors (Fraga)
  11 hphob_eisenberg           Hphob. (Eisenberg consensus)
  12 hphob_sweet               Hphob. OMH (Sweet & Eisenberg)
  13 hphob_woods               Hphob. (Hopp & Woods)
  14 hphob_doolittle           Hydropathicity (Kyte & Doolittle)
  15 hphob_manavalan           Hphob. (Manavalan & Ponnuswamy)
  16 hphob_leo                 Hphob. (Abraham & Leo)
  17 hphob_black               Hphob. (Black & Mould)
  18 hphob_breese              Hphob. (Bull & Breese)
  19 hphob_fauchere            Hphob. (Fauchere & Pliska)
  20 hphob_guy                 Hphob. (Guy)
  21 hphob_janin               Hphob. (Janin)
  22 hphob_miyazawa            Hphob. (Miyazawa et al.)
  23 hphob_argos               Hphob. (Rao & Argos)
  24 hphob_roseman             Hphob. (Roseman)
  25 hphob_tanford             Hphob. (Tanford)
  26 hphob_wolfenden           Hydration potential (Wolfenden et al.)
  27 hphob_welling             Antigenicity (Welling et al.)
  28 hphob_wilson              Hphob. HPLC (Wilson et al.)
  29 hphob_parker              Hphob. HPLC (Parker et al.)
  30 hphob_ph3_4               Hphob. HPLC pH3.4 (Cowan & Whittaker)
  31 hphob_ph7_5               Hphob. HPLC pH7.5 (Cowan & Whittaker)
  32 hphob_mobility            Rf mobility (Aboderin)
  33 hplc_hfba                 HPLC HFBA retention (Browne et al.)
  34 hplc_tfa                  HPLC TFA retention (Browne et al.)
  35 transmembranetendency     Transmembrane tendency (Zhao & London)
  36 hplc_ph2_1                HPLC retention pH2.1 (Meek)
  37 hplc_ph7_4                HPLC retention pH7.4 (Meek)
  38 buriedresidues            % buried residues (Janin)
  39 accessibleresidues        % accessible residues (Janin)
  40 hphob_chothia             Proportion of residues 95% buried (Chothia)
  41 hphob_rose                Mean fractional area loss (Rose et al.)
  42 ratioside                 Ratio hetero end/side (Grantham composition)
  43 averageburied             Average area buried on transfer (Rose et al.)
  44 averageflexibility        Average flexibility (Bhaskaran & Ponnuswamy)
  45 alpha_helixfasman         alpha-helix (Chou & Fasman)
  46 beta_sheetfasman          beta-sheet (Chou & Fasman)
  47 beta_turnfasman           beta-turn (Chou & Fasman)
  48 alpha_helixroux           alpha-helix (Deleage & Roux)
  49 beta_sheetroux            beta-sheet (Deleage & Roux)
  50 beta_turnroux             beta-turn (Deleage & Roux)
  51 coilroux                  Coil (Deleage & Roux)
  52 alpha_helixlevitt         alpha-helix (Levitt)
  53 beta_sheetlevitt          beta-sheet (Levitt)
  54 beta_turnlevitt           beta-turn (Levitt)
  55 totalbeta_strand          Total beta-strand (Lifson & Sander)
  56 antiparallelbeta_strand   Antiparallel beta-strand (Lifson & Sander)
  57 parallelbeta_strand       Parallel beta-strand (Lifson & Sander)
  58 a_a_composition           A.A. composition (McCaldon & Argos)
  59 a_a_swiss_prot            A.A. composition in Swiss-Prot
  60 relativemutability        Relative mutability (Dayhoff)
"""

from __future__ import annotations

import numpy as np

# canonical one-letter ordering used for all rows below
AA_ORDER = "ARNDCQEGHILKMFPSTWYV"

# (name, values-in-AA_ORDER)
EXPASY_SCALE_TABLE: list[tuple[str, list[float]]] = [
    ("pka_cooh_alpha",
     [2.35, 2.17, 2.02, 1.88, 1.96, 2.17, 2.19, 2.34, 1.82, 2.36,
      2.36, 2.18, 2.28, 1.83, 1.99, 2.21, 2.09, 2.83, 2.20, 2.32]),
    ("pka_nh3",
     [9.69, 9.04, 8.80, 9.60, 10.28, 9.13, 9.67, 9.60, 9.17, 9.60,
      9.60, 8.95, 9.21, 9.13, 10.60, 9.15, 9.10, 9.39, 9.11, 9.62]),
    # 7.00 marks a non-ionizable side chain
    ("pka_rgroup",
     [7.00, 12.48, 7.00, 3.65, 8.18, 7.00, 4.25, 7.00, 6.00, 7.00,
      7.00, 10.53, 7.00, 7.00, 7.00, 7.00, 7.00, 7.00, 10.07, 7.00]),
    ("isoelectric_points",
     [6.00, 10.76, 5.41, 2.77, 5.07, 5.65, 3.22, 5.97, 7.59, 6.02,
      5.98, 9.74, 5.74, 5.48, 6.30, 5.68, 5.60, 5.89, 5.66, 5.96]),
    ("molecularweight",
     [89.0, 174.0, 132.0, 133.0, 121.0, 146.0, 147.0, 75.0, 155.0, 131.0,
      131.0, 146.0, 149.0, 165.0, 115.0, 105.0, 119.0, 204.0, 181.0, 117.0]),
    ("numbercodons",
     [4, 6, 2, 2, 2, 2, 2, 4, 2, 3, 6, 2, 1, 2, 4, 6, 4, 1, 2, 4]),
    ("bulkiness",
     [11.50, 14.28, 12.82, 11.68, 13.46, 14.45, 13.57, 3.40, 13.69, 21.40,
      21.40, 15.71, 16.25, 19.80, 17.43, 9.47, 15.77, 21.67, 18.03, 21.57]),
    ("polarityzimmerman",
     [0.00, 52.00, 3.38, 49.70, 1.48, 3.53, 49.90, 0.00, 51.60, 0.13,
      0.13, 49.50, 1.43, 0.35, 1.58, 1.67, 1.66, 2.10, 1.61, 0.13]),
    ("polaritygrantham",
     [8.1, 10.5, 11.6, 13.0, 5.5, 10.5, 12.3, 9.0, 10.4, 5.2,
      4.9, 11.3, 5.7, 5.2, 8.0, 9.2, 8.6, 5.4, 6.2, 5.9]),
    ("refractivity",
     [4.34, 26.66, 13.28, 12.00, 35.77, 17.56, 17.26, 0.00, 21.81, 19.06,
      18.78, 21.29, 21.64, 29.40, 10.93, 6.35, 11.01, 42.53, 31.53, 13.92]),
    ("recognitionfactors",
     [78, 95, 94, 81, 89, 87, 78, 84, 84, 88,
      85, 87, 80, 81, 91, 107, 93, 104, 84, 89]),
    ("hphob_eisenberg",
     [0.62, -2.53, -0.78, -0.90, 0.29, -0.85, -0.74, 0.48, -0.40, 1.38,
      1.06, -1.50, 0.64, 1.19, 0.12, -0.18, -0.05, 0.81, 0.26, 1.08]),
    ("hphob_sweet",
     [-0.40, -0.59, -0.92, -1.31, 0.17, -0.91, -1.22, -0.67, -0.64, 1.25,
      1.22, -0.67, 1.02, 1.92, -0.49, -0.55, -0.28, 0.50, 1.67, 0.91]),
    ("hphob_woods",
     [-0.5, 3.0, 0.2, 3.0, -1.0, 0.2, 3.0, 0.0, -0.5, -1.8,
      -1.8, 3.0, -1.3, -2.5, 0.0, 0.3, -0.4, -3.4, -2.3, -1.5]),
    ("hphob_doolittle",
     [1.8, -4.5, -3.5, -3.5, 2.5, -3.5, -3.5, -0.4, -3.2, 4.5,
      3.8, -3.9, 1.9, 2.8, -1.6, -0.8, -0.7, -0.9, -1.3, 4.2]),
    ("hphob_manavalan",
     [12.97, 11.72, 11.42, 10.85, 14.63, 11.76, 11.89, 12.43, 12.16, 15.67,
      14.90, 11.36, 14.39, 14.00, 11.37, 11.23, 11.69, 13.93, 13.42, 15.71]),
    ("hphob_leo",
     [0.44, -2.42, -1.32, -0.31, 0.58, -0.71, -0.34, 0.00, -0.01, 2.46,
      2.46, -2.45, 1.10, 2.54, 1.29, -0.84, -0.41, 2.56, 1.63, 1.73]),
    ("hphob_black",
     [0.616, 0.000, 0.236, 0.028, 0.680, 0.251, 0.043, 0.501, 0.165, 0.943,
      0.943, 0.283, 0.738, 1.000, 0.711, 0.359, 0.450, 0.878, 0.880, 0.825]),
    ("hphob_breese",
     [0.610, 0.690, 0.890, 0.610, 0.360, 0.970, 0.510, 0.810, 0.690, -1.450,
      -1.650, 0.460, -0.660, -1.520, -0.170, 0.420, 0.290, -1.200, -1.430,
      -0.750]),
    ("hphob_fauchere",
     [0.31, -1.01, -0.60, -0.77, 1.54, -0.22, -0.64, 0.00, 0.13, 1.80,
      1.70, -0.99, 1.23, 1.79, 0.72, -0.04, 0.26, 2.25, 0.96, 1.22]),
    ("hphob_guy",
     [0.10, 1.91, 0.48, 0.78, -1.42, 0.95, 0.83, 0.33, -0.50, -1.13,
      -1.18, 1.40, -1.59, -2.12, 0.73, 0.52, 0.07, -0.51, -0.21, -1.27]),
    ("hphob_janin",
     [0.3, -1.4, -0.5, -0.6, 0.9, -0.7, -0.7, 0.3, -0.1, 0.7,
      0.5, -1.8, 0.4, 0.5, -0.3, -0.1, -0.2, 0.3, -0.4, 0.6]),
    ("hphob_miyazawa",
     [5.33, 4.18, 3.71, 3.59, 7.93, 3.87, 3.65, 4.48, 5.10, 8.83,
      8.47, 2.95, 8.95, 9.03, 3.87, 4.09, 4.49, 7.66, 5.89, 7.63]),
    ("hphob_argos",
     [1.36, 0.15, 0.33, 0.11, 1.27, 0.33, 0.25, 1.09, 0.68, 1.44,
      1.47, 0.09, 1.42, 1.57, 0.54, 0.97, 1.08, 1.00, 0.83, 1.37]),
    ("hphob_roseman",
     [0.39, -3.95, -1.91, -3.81, 0.25, -1.30, -2.91, 0.00, -0.64, 1.82,
      1.82, -2.77, 0.96, 2.27, 0.99, -1.24, -1.00, 2.13, 1.47, 1.30]),
    ("hphob_tanford",
     [0.62, -2.53, -0.78, -0.09, 0.29, -0.85, -0.74, 0.48, -0.40, 1.38,
      1.53, -1.50, 0.64, 1.19, 0.12, -0.18, -0.05, 0.81, 0.26, 1.80]),
    ("hphob_wolfenden",
     [1.94, -19.92, -9.68, -10.95, -1.24, -9.38, -10.20, 2.39, -10.27, 2.15,
      2.28, -9.52, -1.48, -0.76, 0.00, -5.06, -4.88, -5.88, -6.11, 1.99]),
    ("hphob_welling",
     [0.115, 0.058, -0.077, 0.065, -0.120, -0.011, -0.071, -0.184, 0.312,
      -0.292, 0.075, 0.206, -0.385, 0.074, -0.053, -0.026, -0.045, -0.114,
      0.013, -0.013]),
    ("hphob_wilson",
     [-0.3, -1.1, -0.2, -1.4, 6.3, -0.2, 0.0, 1.2, -1.3, 4.3,
      6.6, -3.6, 2.5, 7.5, 2.2, -0.6, -2.2, 7.9, 7.1, 5.9]),
    ("hphob_parker",
     [2.1, 4.2, 7.0, 10.0, 1.4, 6.0, 7.8, 5.7, 2.1, -8.0,
      -9.2, 5.7, -4.2, -9.2, 2.1, 6.5, 5.2, -10.0, -1.9, -3.7]),
    ("hphob_ph3_4",
     [0.42, -1.56, -1.03, -0.51, 0.84, -0.96, -0.37, 0.00, -2.28, 1.81,
      1.80, -2.03, 1.18, 1.74, 0.86, -0.64, -0.26, 1.46, 0.51, 1.34]),
    ("hphob_ph7_5",
     [0.35, -1.50, -0.99, -2.15, 0.76, -0.93, -1.95, 0.00, -0.65, 1.83,
      1.80, -1.54, 1.10, 1.69, 0.84, -0.63, -0.27, 1.35, 0.39, 1.32]),
    ("hphob_mobility",
     [5.1, 2.0, 0.6, 0.7, 0.0, 1.4, 1.8, 4.1, 1.6, 9.3,
      10.0, 1.3, 8.7, 9.6, 4.9, 3.1, 3.5, 9.2, 8.0, 8.5]),
    ("hplc_hfba",
     [3.9, 3.2, -2.8, -2.8, -14.3, 1.8, -7.5, -2.3, 2.0, 11.0,
      15.0, -2.5, 4.1, 14.7, 5.6, -3.5, 1.1, 17.8, 3.8, 2.1]),
    ("hplc_tfa",
     [7.3, -3.6, -5.7, -2.9, -9.2, -0.3, -7.1, -1.2, -2.1, 6.6,
      20.0, -3.7, 5.6, 19.2, 5.1, -4.1, 0.8, 16.3, 5.9, 3.5]),
    ("transmembranetendency",
     [0.38, -2.57, -1.62, -3.27, -0.30, -1.84, -2.90, -0.19, -1.44, 1.97,
      1.82, -3.46, 1.40, 1.98, -1.44, -0.53, -0.32, 1.53, 0.49, 1.46]),
    ("hplc_ph2_1",
     [-0.1, -4.5, -1.6, -2.8, -2.2, -2.5, -7.5, -0.5, 0.8, 11.8,
      10.0, -3.2, 7.1, 13.9, 8.0, -3.7, 1.5, 18.1, 8.2, 3.3]),
    ("hplc_ph7_4",
     [0.5, 0.8, 0.8, -8.2, -6.8, -4.8, -16.9, 0.0, -3.5, 13.9,
      8.8, 0.1, 4.8, 13.2, 6.1, 1.2, 2.7, 14.9, 6.1, 2.7]),
    ("buriedresidues",
     [11.2, 0.5, 2.9, 2.9, 4.1, 1.6, 1.8, 11.8, 2.0, 8.6,
      11.7, 0.5, 1.9, 5.1, 2.7, 8.0, 4.9, 2.2, 2.6, 12.9]),
    ("accessibleresidues",
     [6.6, 4.5, 6.7, 7.7, 0.9, 5.2, 5.7, 6.7, 2.5, 2.8,
      4.8, 10.3, 1.0, 2.4, 4.8, 9.4, 7.0, 1.4, 5.1, 4.5]),
    ("hphob_chothia",
     [0.38, 0.01, 0.12, 0.15, 0.50, 0.07, 0.18, 0.36, 0.17, 0.60,
      0.45, 0.03, 0.40, 0.50, 0.18, 0.22, 0.23, 0.27, 0.15, 0.54]),
    ("hphob_rose",
     [0.74, 0.64, 0.63, 0.62, 0.91, 0.62, 0.62, 0.72, 0.78, 0.88,
      0.85, 0.52, 0.85, 0.88, 0.64, 0.66, 0.70, 0.85, 0.76, 0.86]),
    ("ratioside",
     [0.00, 0.65, 1.33, 1.38, 2.75, 0.89, 0.92, 0.74, 0.58, 0.00,
      0.00, 0.33, 0.00, 0.00, 0.39, 1.42, 0.71, 0.13, 0.20, 0.00]),
    ("averageburied",
     [86.6, 162.2, 103.3, 97.8, 132.3, 119.2, 113.9, 62.9, 155.8, 158.0,
      164.1, 115.5, 172.9, 194.1, 92.9, 85.6, 106.5, 224.6, 177.7, 141.0]),
    ("averageflexibility",
     [0.360, 0.530, 0.460, 0.510, 0.350, 0.490, 0.500, 0.540, 0.320, 0.460,
      0.370, 0.470, 0.300, 0.310, 0.510, 0.510, 0.440, 0.310, 0.420, 0.390]),
    ("alpha_helixfasman",
     [1.42, 0.98, 0.67, 1.01, 0.70, 1.11, 1.51, 0.57, 1.00, 1.08,
      1.21, 1.16, 1.45, 1.13, 0.57, 0.77, 0.83, 1.08, 0.69, 1.06]),
    ("beta_sheetfasman",
     [0.83, 0.93, 0.89, 0.54, 1.19, 1.10, 0.37, 0.75, 0.87, 1.60,
      1.30, 0.74, 1.05, 1.38, 0.55, 0.75, 1.19, 1.37, 1.47, 1.70]),
    ("beta_turnfasman",
     [0.66, 0.95, 1.56, 1.46, 1.19, 0.98, 0.74, 1.56, 0.95, 0.47,
      0.59, 1.01, 0.60, 0.60, 1.52, 1.43, 0.96, 0.96, 1.14, 0.50]),
    ("alpha_helixroux",
     [1.489, 1.224, 0.772, 0.924, 0.966, 1.164, 1.504, 0.510, 1.003, 1.003,
      1.236, 1.172, 1.363, 1.195, 0.492, 0.739, 0.785, 1.090, 0.787, 0.990]),
    ("beta_sheetroux",
     [0.709, 0.920, 0.604, 0.541, 1.191, 0.840, 0.567, 0.657, 0.863, 1.799,
      1.261, 0.721, 1.210, 1.393, 0.354, 0.928, 1.221, 1.306, 1.266, 1.965]),
    ("beta_turnroux",
     [0.788, 0.912, 1.572, 1.197, 0.965, 0.997, 1.149, 1.860, 0.970, 0.240,
      0.670, 1.302, 0.436, 0.624, 1.415, 1.316, 0.739, 0.546, 0.795, 0.387]),
    ("coilroux",
     [0.824, 0.893, 1.167, 1.197, 0.953, 0.947, 0.761, 1.251, 1.068, 0.886,
      0.810, 0.897, 0.810, 0.797, 1.540, 1.130, 1.148, 0.941, 1.109, 0.772]),
    ("alpha_helixlevitt",
     [1.29, 0.96, 0.90, 1.04, 1.11, 1.27, 1.44, 0.56, 1.22, 0.97,
      1.30, 1.23, 1.47, 1.07, 0.52, 0.82, 0.82, 0.99, 0.72, 0.91]),
    ("beta_sheetlevitt",
     [0.90, 0.99, 0.76, 0.72, 0.74, 0.80, 0.75, 0.92, 1.08, 1.45,
      1.02, 0.77, 0.97, 1.32, 0.64, 0.95, 1.21, 1.14, 1.25, 1.49]),
    ("beta_turnlevitt",
     [0.77, 0.88, 1.28, 1.41, 0.81, 0.98, 0.99, 1.64, 0.68, 0.51,
      0.58, 0.96, 0.41, 0.59, 1.91, 1.32, 1.04, 0.76, 1.05, 0.47]),
    ("totalbeta_strand",
     [0.92, 0.93, 0.60, 0.48, 1.16, 0.95, 0.61, 0.61, 0.93, 1.81,
      1.30, 0.70, 1.19, 1.25, 0.40, 0.82, 1.12, 1.54, 1.53, 1.81]),
    ("antiparallelbeta_strand",
     [0.90, 1.02, 0.62, 0.47, 1.24, 1.18, 0.62, 0.56, 1.12, 1.54,
      1.26, 0.74, 1.09, 1.23, 0.42, 0.87, 1.30, 1.75, 1.68, 1.53]),
    ("parallelbeta_strand",
     [1.11, 0.42, 0.54, 0.50, 0.52, 0.28, 0.68, 0.79, 0.38, 2.60,
      1.42, 0.59, 1.34, 1.33, 0.31, 0.70, 0.59, 1.04, 1.23, 2.63]),
    ("a_a_composition",
     [8.3, 5.7, 4.4, 5.3, 1.7, 4.0, 6.2, 7.2, 2.2, 5.2,
      9.0, 5.7, 2.4, 3.9, 5.1, 6.9, 5.8, 1.3, 3.2, 6.6]),
    ("a_a_swiss_prot",
     [8.25, 5.53, 4.06, 5.45, 1.37, 3.93, 6.75, 7.07, 2.27, 5.96,
      9.66, 5.84, 2.42, 3.86, 4.70, 6.56, 5.34, 1.08, 2.92, 6.87]),
    ("relativemutability",
     [100, 65, 134, 106, 20, 93, 102, 49, 66, 96,
      40, 56, 94, 41, 56, 120, 97, 18, 41, 74]),
]

EXPASY_SCALE_NAMES = [name for name, _ in EXPASY_SCALE_TABLE]
N_EXPASY_SCALES = len(EXPASY_SCALE_TABLE)  # 61
assert N_EXPASY_SCALES == 61, N_EXPASY_SCALES

# (61, 20) matrix, columns in AA_ORDER
EXPASY_MATRIX = np.asarray([vals for _, vals in EXPASY_SCALE_TABLE],
                           dtype=np.float64)
assert EXPASY_MATRIX.shape == (61, 20), EXPASY_MATRIX.shape

_AA_TO_COL = {a: i for i, a in enumerate(AA_ORDER)}


def expasy_block(one_letter_seq) -> np.ndarray:
    """(N,) iterable of 1-letter codes → (N, 61) float feature block in
    graphein column order."""
    cols = np.asarray([_AA_TO_COL[a] for a in one_letter_seq], np.int64)
    return EXPASY_MATRIX[:, cols].T
