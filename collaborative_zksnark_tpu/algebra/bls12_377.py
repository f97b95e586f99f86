"""BLS12-377 curve constants (mathematical parameters, as plain Python ints).

These are the published parameters of the BLS12-377 pairing-friendly curve
(Zexe / arkworks `curves/bls12_377`; see reference
`curves/bls12_377/src/fields/{fr,fq}.rs` and `curves/mod.rs` for the same
numbers).  Everything derivable (roots of unity, Frobenius coefficients,
Montgomery constants) is computed here rather than tabulated.
"""

# --- Scalar field Fr -------------------------------------------------------
# r = |G1| = |G2|, 253 bits.  ref: curves/bls12_377/src/fields/fr.rs:31-39
R_MOD = 8444461749428370424248824938781546531375899335154063827935233455917409239041
FR_BITS = 253
# multiplicative generator of Fr* (ref fr.rs:64 "GENERATOR = 11")
FR_GENERATOR = 11
# r - 1 = 2^47 * 3 * odd  (TWO_ADICITY=47, SMALL_SUBGROUP_BASE=3, adicity 1;
# ref fr.rs:11,21-22) -> supports radix-2 domains up to 2^47 and mixed-radix
# 3*2^k domains (needed by the Plonk wires domain, ref mpc-plonk/src/relations/flat.rs:289-293).
FR_TWO_ADICITY = 47
FR_SMALL_SUBGROUP_BASE = 3
FR_SMALL_SUBGROUP_ADICITY = 1

assert (R_MOD - 1) % (2**FR_TWO_ADICITY * 3) == 0

#: generator of the order-2^47 subgroup, g^((r-1)/2^47).  This matches
#: what arkworks ACTUALLY uses for BLS12-377 Fr domains: for fields with
#: a small subgroup, ark_ff::get_root_of_unity (ref
#: algebra/ff/src/fields/mod.rs:337-367) derives every domain generator
#: from LARGE_SUBGROUP_ROOT_OF_UNITY (= g^((r-1)/(3*2^47)), fr.rs:23-28)
#: cubed and squared down — the fr.rs:14-18 TWO_ADIC_ROOT_OF_UNITY
#: literal is NOT used for this field.  So domain element order (and
#: every FFT output) is identical to the reference's.
FR_TWO_ADIC_ROOT = pow(FR_GENERATOR, (R_MOD - 1) >> FR_TWO_ADICITY, R_MOD)
#: generator of the order-(3 * 2^47) subgroup ("LARGE_SUBGROUP_ROOT_OF_UNITY",
#: ref fr.rs:23-28 — equals FR_GENERATOR^((r-1)/(3*2^47)))
FR_LARGE_SUBGROUP_ROOT = pow(
    FR_GENERATOR, (R_MOD - 1) // (2**FR_TWO_ADICITY * 3), R_MOD
)
assert FR_TWO_ADIC_ROOT == pow(FR_LARGE_SUBGROUP_ROOT, 3, R_MOD)

# --- Base field Fq ---------------------------------------------------------
# q, 377 bits.  ref: curves/bls12_377/src/fields/fq.rs:24
Q_MOD = 258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177
FQ_BITS = 377
FQ_GENERATOR = Q_MOD - 5  # "GENERATOR = -5", ref fq.rs:64
FQ_TWO_ADICITY = 46

# --- BLS parameter ---------------------------------------------------------
# The BLS parameter x: q and r are the BLS12 polynomials evaluated at x.
# ref: curves/bls12_377/src/curves/mod.rs:16 (X positive, D-type twist)
BLS_X = 0x8508C00000000001
BLS_X_IS_NEG = False

assert R_MOD == BLS_X**4 - BLS_X**2 + 1
assert Q_MOD == ((BLS_X - 1) ** 2 * R_MOD) // 3 + BLS_X

# --- Tower -----------------------------------------------------------------
# Fq2 = Fq[u]/(u^2 + 5)            (nonresidue -5, ref fq2.rs:13)
# Fq6 = Fq2[v]/(v^3 - u)           (nonresidue u, ref fq6.rs:14)
# Fq12 = Fq6[w]/(w^2 - v)
FQ2_NONRESIDUE = Q_MOD - 5

# --- G1: y^2 = x^3 + 1 -----------------------------------------------------
G1_A = 0
G1_B = 1
# ref: curves/bls12_377/src/curves/g1.rs:46,51
G1_GEN_X = 81937999373150964239938255573465948239988671502647976594219695644855304257327692006745978603320413799295628339695
G1_GEN_Y = 241266749859715473739788878240585681733927191168601896383759122102112907357779751001206799952863815012735208165030
G1_COFACTOR = 30631250834960419227450344600217059328
assert G1_COFACTOR == (BLS_X - 1) ** 2 // 3

# --- G2 (D-type twist): y^2 = x^3 + b/u over Fq2 ---------------------------
# b2 = b * u^{-1} = -u/5 -> (c0, c1) = (0, -1/5 mod q); ref g2.rs:29-32
G2_B_C0 = 0
G2_B_C1 = 155198655607781456406391640216936120121836107652948796323930557600032281009004493664981332883744016074664192874906
assert G2_B_C1 == Q_MOD - pow(5, Q_MOD - 2, Q_MOD)
# ref: curves/bls12_377/src/curves/g2.rs:69-86
G2_GEN_X_C0 = 233578398248691099356572568220835526895379068987715365179118596935057653620464273615301663571204657964920925606294
G2_GEN_X_C1 = 140913150380207355837477652521042157274541796891053068589147167627541651775299824604154852141315666357241556069118
G2_GEN_Y_C0 = 63160294768292073209381361943935198908131692476676907196754037919244929611450776219210369229519898517858833747423
G2_GEN_Y_C1 = 149157405641012693445398062341192467754805999074082136895788947234480009303640899064710353187729182149407503257491
G2_COFACTOR = 7923214915284317143930293550643874566881017850177945424769256759165301436616933228209277966774092486467289478618404761412630691835764674559376407658497
