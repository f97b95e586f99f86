"""Ergonomic R1CS front-end: symbolic linear-combination arithmetic,
namespaces and a constraint trace over the core `r1cs.R1CS` builder.

The analog of ark-relations' ConstraintSystem surface (ref
snark/relations/src/r1cs/constraint_system.rs: LinearCombination operator
impls, `ns!` namespaces, `which_is_unsatisfied`): the reference exposes
`new_witness_variable`/`enforce_constraint` over `LinearCombination<F>`
values with +,-,* scalar ops, allows instance/witness allocation in any
order, names every constraint with the active namespace path, and reports
the first unsatisfied constraint's trace.  Here the same surface is
host-side Python (circuit structure is public; only assignments ever live
on device or as MPC shares).  Variables are abstract until `build()`,
which lowers to `r1cs.R1CS` index order (ONE, instances, witnesses) —
the packed-matrix form the device provers consume.

Usage:
    b = CircuitBuilder()
    x = b.witness("x", 3)
    y = b.instance("y", 81)          # interleaving is fine
    with b.namespace("square-chain"):
        x2 = b.mul(x, x, name="x2")  # allocates + enforces
        x4 = b.mul(x2, x2, name="x4")
    b.enforce(x4, b.one, y, name="out")   # x4 * 1 == y
    cs = b.build()                    # -> r1cs.R1CS
    inst, wit = b.assignment()
"""

from __future__ import annotations

import contextlib
from typing import Dict, List, Optional, Tuple, Union

from ..algebra import params as C
from . import r1cs as core

_P = C.R_MOD


class LinComb:
    """Immutable linear combination over abstract circuit variables.

    Supports lc + lc, lc - lc, int * lc, lc * int, lc + int (the constant
    rides on variable 0 = ONE) — the operator set ark-relations implements
    for LinearCombination (constraint_system.rs Add/Sub/Mul impls)."""

    __slots__ = ("terms",)

    def __init__(self, terms: Dict[int, int]):
        self.terms = {v: c % _P for v, c in terms.items() if c % _P}

    @staticmethod
    def of(x: Union["LinComb", int]) -> "LinComb":
        if isinstance(x, LinComb):
            return x
        if not isinstance(x, int) or isinstance(x, bool):
            raise TypeError(
                f"LinComb scalar must be int, got {type(x).__name__} "
                "(a float would silently truncate)")
        return LinComb({0: x})

    def __add__(self, other):
        other = LinComb.of(other)
        t = dict(self.terms)
        for v, c in other.terms.items():
            t[v] = (t.get(v, 0) + c) % _P
        return LinComb(t)

    __radd__ = __add__

    def __sub__(self, other):
        return self + (-1) * LinComb.of(other)

    def __rsub__(self, other):
        return LinComb.of(other) + (-1) * self

    def __mul__(self, k: int):
        if isinstance(k, LinComb):
            raise TypeError(
                "LinComb * LinComb is not linear — use CircuitBuilder.mul "
                "to allocate a product witness")
        if not isinstance(k, int) or isinstance(k, bool):
            raise TypeError(
                f"LinComb scalar must be int, got {type(k).__name__} "
                "(a float would silently truncate)")
        return LinComb({v: c * k % _P for v, c in self.terms.items()})

    __rmul__ = __mul__

    def __neg__(self):
        return (-1) * self

    def evaluate(self, values: Dict[int, int]) -> int:
        return sum(c * values[v] for v, c in self.terms.items()) % _P


class CircuitBuilder:
    """Namespaced constraint builder with assignment tracking.

    Every variable and constraint carries its namespace path, so
    `which_unsatisfied` can name the failing constraint like
    ark-relations' `which_is_unsatisfied` (constraint trace)."""

    def __init__(self):
        self._next = 1                        # abstract ids; 0 = ONE
        self._kind: Dict[int, bool] = {}      # id -> is_instance
        self._order: List[int] = []           # allocation order
        self._values: Dict[int, int] = {0: 1}
        self._rows: List[Tuple[LinComb, LinComb, LinComb]] = []
        self._names: List[str] = []           # constraint trace, per row
        self._var_names: Dict[int, str] = {0: "one"}
        self._ns: List[str] = []
        self.one = LinComb({0: 1})

    # -- namespaces ---------------------------------------------------------
    @contextlib.contextmanager
    def namespace(self, name: str):
        self._ns.append(name)
        try:
            yield self
        finally:
            self._ns.pop()

    def _path(self, name: str) -> str:
        return "/".join(self._ns + [name])

    # -- allocation (any interleaving; lowered to index order at build) ------
    def _alloc(self, name: str, value: int, is_instance: bool) -> LinComb:
        v = self._next
        self._next += 1
        self._kind[v] = is_instance
        self._order.append(v)
        self._values[v] = int(value) % _P
        self._var_names[v] = self._path(name)
        return LinComb({v: 1})

    def instance(self, name: str, value: int) -> LinComb:
        return self._alloc(name, value, True)

    def witness(self, name: str, value: int) -> LinComb:
        return self._alloc(name, value, False)

    # -- constraints ----------------------------------------------------------
    def enforce(self, a, b, c, name: str = "enforce"):
        """a * b == c  (each a LinComb or int constant)."""
        self._rows.append((LinComb.of(a), LinComb.of(b), LinComb.of(c)))
        self._names.append(self._path(name))

    def enforce_equal(self, a, b, name: str = "eq"):
        self.enforce(a, self.one, b, name=name)

    def enforce_boolean(self, a, name: str = "bool"):
        """a * (1 - a) == 0."""
        self.enforce(a, self.one - LinComb.of(a), 0, name=name)

    # -- gadgets ------------------------------------------------------------
    def mul(self, a, b, name: str = "mul") -> LinComb:
        """Allocate the product witness and enforce a * b == out."""
        a, b = LinComb.of(a), LinComb.of(b)
        val = a.evaluate(self._values) * b.evaluate(self._values) % _P
        out = self.witness(name, val)
        self.enforce(a, b, out, name=name)
        return out

    def inv(self, a, name: str = "inv") -> LinComb:
        """Allocate 1/a and enforce a * inv == 1 (a must be nonzero)."""
        a = LinComb.of(a)
        av = a.evaluate(self._values)
        out = self.witness(name, pow(av, _P - 2, _P))
        self.enforce(a, out, 1, name=name)
        return out

    def select(self, bit, t, f, name: str = "select") -> LinComb:
        """bit ? t : f  for a boolean bit: f + bit*(t - f)."""
        d = self.mul(bit, LinComb.of(t) - LinComb.of(f), name=name)
        return LinComb.of(f) + d

    # -- synthesis / diagnostics ---------------------------------------------
    def _index_map(self) -> Dict[int, int]:
        inst = [v for v in self._order if self._kind[v]]
        wit = [v for v in self._order if not self._kind[v]]
        m = {0: 0}
        for i, v in enumerate(inst):
            m[v] = 1 + i
        for i, v in enumerate(wit):
            m[v] = 1 + len(inst) + i
        return m

    def build(self) -> core.R1CS:
        """Lower to the core packed-matrix R1CS (index order: ONE,
        instances in allocation order, then witnesses)."""
        m = self._index_map()
        cs = core.R1CS()
        for v in self._order:
            if self._kind[v]:
                cs.new_instance()
        for v in self._order:
            if not self._kind[v]:
                cs.new_witness()
        for a, b, c in self._rows:
            cs.enforce(*(sorted((m[v], cf) for v, cf in lc.terms.items())
                         for lc in (a, b, c)))
        return cs

    def assignment(self) -> Tuple[List[int], List[int]]:
        inst = [1] + [self._values[v] for v in self._order if self._kind[v]]
        wit = [self._values[v] for v in self._order if not self._kind[v]]
        return inst, wit

    def is_satisfied(self) -> bool:
        return self.which_unsatisfied() is None

    def which_unsatisfied(self) -> Optional[str]:
        """Namespace path of the first violated constraint, or None —
        the ark-relations `which_is_unsatisfied` diagnostic."""
        for i, (a, b, c) in enumerate(self._rows):
            if (a.evaluate(self._values) * b.evaluate(self._values) % _P
                    != c.evaluate(self._values)):
                return self._names[i]
        return None

    def set_value(self, lc: LinComb, value: int):
        """Override a single allocated variable's assignment (testing the
        unsatisfied-trace path)."""
        if len(lc.terms) != 1:
            raise ValueError("set_value expects a bare variable LinComb")
        (v, coeff), = lc.terms.items()
        if coeff != 1:
            raise ValueError("set_value expects a bare variable (coeff 1)")
        if v == 0:
            raise ValueError("cannot override the constant ONE (variable 0)")
        self._values[v] = int(value) % _P
