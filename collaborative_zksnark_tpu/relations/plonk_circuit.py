"""Plonk circuit representation: gate list + flattened layout polynomials.

Re-design of the reference's mpc-plonk relations (behavioral spec:
ref mpc-plonk/src/relations/structured.rs:4-82 PlonkCircuit builder;
relations/flat.rs:19-137 CircuitLayout with gate-selector poly S, wiring
permutation poly W, wire poly P over a gates domain of size n = 2^k
(radix-2) and a wires domain of size 3n (mixed-radix), with the gates
generator equal to the cube of the wires generator).

The wire VALUES may be secret shares; the layout (S, W, index maps) is
public structure.  P's evaluations are a gather of the value vector by the
layout indices — share-local.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..algebra import params as C
from ..algebra import field as F
from ..algebra.field import FR
from ..ops import ntt

P = C.R_MOD


class PlonkCircuit:
    """Gate list: products and sums over a flat variable space."""

    def __init__(self, with_values: bool = True):
        self.n_vars = 0
        self.pub_vars: Dict[int, str] = {}
        self.prods: List[Tuple[int, int, int]] = []
        self.sums: List[Tuple[int, int, int]] = []
        self.values: Optional[List[int]] = [] if with_values else None

    def new_var(self, value: Optional[int] = None) -> int:
        v = self.n_vars
        self.n_vars += 1
        if self.values is not None:
            self.values.append(value % P)
        return v

    def publicize_var(self, v: int, name: str):
        assert v not in self.pub_vars
        self.pub_vars[v] = name

    def new_sum(self, a: int, b: int) -> int:
        out = self.n_vars
        self.n_vars += 1
        if self.values is not None:
            self.values.append((self.values[a] + self.values[b]) % P)
        self.sums.append((a, b, out))
        return out

    def new_prod(self, a: int, b: int) -> int:
        out = self.n_vars
        self.n_vars += 1
        if self.values is not None:
            self.values.append((self.values[a] * self.values[b]) % P)
        self.prods.append((a, b, out))
        return out

    @property
    def n_gates(self) -> int:
        return len(self.prods) + len(self.sums)

    def pad_to_power_of_2(self):
        n = 1 << max(1, (self.n_gates - 1).bit_length())
        if self.n_gates == 0:
            n = 1
        v = self.n_vars - 1
        while self.n_gates < n:
            self.new_sum(v, v)
            v = self.n_vars - 1

    @staticmethod
    def squaring(steps: int, start: Optional[int] = None) -> "PlonkCircuit":
        """The benchmark circuit (ref structured.rs:72-81 + proof.rs:220-233):
        x_{i+1} = x_i^2, final value public as "out"."""
        c = PlonkCircuit(with_values=start is not None)
        v = c.new_var(start if start is not None else 0)
        for _ in range(steps):
            v = c.new_prod(v, v)
        c.pad_to_power_of_2()
        c.publicize_var(v, "out")
        return c


@dataclasses.dataclass
class CircuitLayout:
    n_gates: int
    gates_domain: ntt.Radix2Domain
    wires_domain: ntt.MixedRadixDomain
    s_coeffs: jnp.ndarray            # public selector poly, (n, L)
    w_coeffs: jnp.ndarray            # public wiring-permutation poly, (3n, L)
    var_layout: np.ndarray           # (3n,) var index at each wire position
    vars_to_indices: Dict[int, List[int]]
    public_indices: Dict[str, int]   # name -> wire position
    pub_vars: Dict[int, str]

    @staticmethod
    def from_circuit(c: PlonkCircuit) -> "CircuitLayout":
        n = c.n_gates
        assert n & (n - 1) == 0, "pad the circuit first"
        gates = ntt.get_radix2_domain(n)
        wires = ntt.get_mixed_domain(3 * n)
        assert wires.n == 3 * n
        # gates generator must be the cube of the wires generator so that the
        # gate-constraint divisor vanishes exactly on the gate points
        # (ref flat.rs:282-301 domain compatibility assertions)
        assert gates.omega == pow(wires.omega, 3, P)

        # selector: 0 for products, 1 for sums (prods laid out first)
        sel = [0] * len(c.prods) + [1] * len(c.sums)
        s_coeffs = gates.ifft(FR.to_device(sel))

        var_layout = np.array(
            [v for gate in (c.prods + c.sums) for v in gate], dtype=np.int64
        )
        vars_to_indices: Dict[int, List[int]] = {v: [] for v in range(c.n_vars)}
        for i, v in enumerate(var_layout):
            vars_to_indices[int(v)].append(i)

        # W(eta^i) = eta^{sigma(i)}: next index in the variable's cycle
        eta_pows = wires.elements()
        w_evals = [0] * (3 * n)
        for v, idxs in vars_to_indices.items():
            if not idxs:
                continue
            for j, i in enumerate(idxs):
                w_evals[i] = eta_pows[idxs[(j + 1) % len(idxs)]]
        w_coeffs = wires.ifft(FR.to_device(w_evals))

        public_indices = {
            name: vars_to_indices[v][0]
            for v, name in c.pub_vars.items()
            if vars_to_indices.get(v)
        }
        return CircuitLayout(
            n_gates=n,
            gates_domain=gates,
            wires_domain=wires,
            s_coeffs=s_coeffs,
            w_coeffs=w_coeffs,
            var_layout=var_layout,
            vars_to_indices=vars_to_indices,
            public_indices=public_indices,
            pub_vars=dict(c.pub_vars),
        )

    def p_evals_from_values(self, scheme, values_sh):
        """P(eta^i) = value[var_layout[i]] — a share-local gather."""
        idx = jnp.asarray(self.var_layout)
        return scheme.lin_map(lambda arr: arr[..., idx, :], values_sh)
