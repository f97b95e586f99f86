"""CircuitBuilder front-end: LC arithmetic, namespaces, constraint trace,
and an end-to-end Groth16 prove of a builder-made circuit (the surface of
ark-relations' ConstraintSystem, ref
snark/relations/src/r1cs/constraint_system.rs)."""

import numpy as np
import pytest

from collaborative_zksnark_tpu.algebra import params as C
from collaborative_zksnark_tpu.relations.builder import CircuitBuilder, LinComb

P = C.R_MOD


def test_lincomb_arithmetic():
    a = LinComb({1: 2, 2: 3})
    b = LinComb({2: 4, 3: 1})
    s = a + b
    assert s.terms == {1: 2, 2: 7, 3: 1}
    d = a - b
    assert d.terms == {1: 2, 2: (3 - 4) % P, 3: P - 1}
    k = 5 * a
    assert k.terms == {1: 10, 2: 15}
    c = a + 7  # constant rides on var 0
    assert c.terms[0] == 7
    assert (-a).terms[1] == P - 2
    with pytest.raises(TypeError):
        a * b  # nonlinear


def test_gadgets_and_trace():
    b = CircuitBuilder()
    x = b.witness("x", 3)
    y = b.instance("y", 81)
    with b.namespace("chain"):
        x2 = b.mul(x, x, name="x2")
        x4 = b.mul(x2, x2, name="x4")
    b.enforce_equal(x4, y, name="out")
    bit = b.witness("bit", 1)
    b.enforce_boolean(bit, name="bit")
    sel = b.select(bit, x4, x, name="sel")
    assert sel.evaluate(b._values) == 81
    inv = b.inv(x, name="xinv")
    assert inv.evaluate(b._values) * 3 % P == 1
    assert b.is_satisfied()
    assert b.which_unsatisfied() is None
    # violate the namespaced product: trace names the constraint path
    b.set_value(x2, 10)
    assert b.which_unsatisfied() == "chain/x2"


def test_builder_groth16_prove():
    from collaborative_zksnark_tpu.algebra import field as F
    from collaborative_zksnark_tpu.snark import groth16

    b = CircuitBuilder()
    x = b.witness("x", 5)
    y = b.instance("y", pow(5, 8, P))
    acc = x
    with b.namespace("pow8"):
        for i in range(3):
            acc = b.mul(acc, acc, name=f"sq{i}")
    b.enforce_equal(acc, y, name="out")
    assert b.is_satisfied()
    cs = b.build()
    inst, wit = b.assignment()
    pk, vk = groth16.setup(cs, seed=21)
    rng = np.random.default_rng(0)
    z = F.FR.to_device(inst + wit)
    pf = groth16.prove(pk, cs, z, F.rand(F.FR, rng, ()), F.rand(F.FR, rng, ()))
    hp = groth16.reveal_proof(pf)
    assert groth16.verify(vk, hp, inst[1:]) is True
    bad = list(inst[1:])
    bad[0] = (bad[0] + 1) % P
    assert groth16.verify(vk, hp, bad) is False
