"""Party networking layer — the TPU-native analog of the reference's
`mpc-net` crate (ref: mpc-net/src/lib.rs:28-70 `MpcNet` trait; multi.rs
full-mesh broadcast + king star ops; Stats at lib.rs:7-26).

Instead of blocking TCP sockets, parties are SPMD program instances:

  * `StackedNet` — N *logical* parties inside one process; every share
    carries a leading party axis P.  Collectives are axis-0 array ops.  This
    is the unit-test backend (the analog of the reference's N processes on
    localhost, SURVEY.md §4.4) and is bit-identical to the mesh backend.
  * `MeshNet`  — parties mapped to an axis of a `jax.sharding.Mesh`;
    protocol code runs inside `shard_map` and collectives lower to XLA
    all_gathers over ICI/DCN.

Protocol code is written once against this API:
  * shares are arrays whose leading party axis exists only in StackedNet;
    in MeshNet each program instance holds its slice.
  * "public" values carry no party axis (StackedNet) / are replicated
    (MeshNet) — identical code paths.
  * `party_iota()` broadcasts the party index for king-conditional logic
    (the reference's `am_king()`, lib.rs:49).

Traffic accounting mirrors the reference's `Stats` (bytes are computed from
static shapes at trace time — one entry per collective call).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Stats:
    """Per-party traffic counters (ref mpc-net/src/lib.rs:7-26)."""

    bytes_sent: int = 0
    bytes_recv: int = 0
    broadcasts: int = 0
    to_king: int = 0
    from_king: int = 0

    def reset(self):
        self.bytes_sent = 0
        self.bytes_recv = 0
        self.broadcasts = 0
        self.to_king = 0
        self.from_king = 0

    def as_dict(self):
        return dataclasses.asdict(self)


def _nbytes(x) -> int:
    return int(np.prod(x.shape)) * x.dtype.itemsize


class StackedNet:
    """N logical parties; shares have leading axis P, public values none."""

    def __init__(self, n_parties: int):
        self.n = n_parties
        self.stats = Stats()

    # -- identity ----------------------------------------------------------
    def n_parties(self) -> int:
        return self.n

    def party_iota(self, extra_dims: int = 0):
        """Party index, broadcastable against a share: shape (P, 1...)."""
        return jnp.arange(self.n, dtype=jnp.uint32).reshape(
            (self.n,) + (1,) * extra_dims
        )

    def is_king(self, extra_dims: int = 0):
        return self.party_iota(extra_dims) == 0

    # -- collectives -------------------------------------------------------
    def all_gather(self, sh):
        """Full-mesh broadcast (ref multi.rs:145-174): every party learns
        every share.  Stacked: the stack IS the gather; returns (P, ...)."""
        self.stats.broadcasts += 1
        per_party = _nbytes(sh) // self.n
        self.stats.bytes_sent += per_party * (self.n - 1)
        self.stats.bytes_recv += per_party * (self.n - 1)
        return sh

    def atomic_gather(self, sh, tamper_fn=None):
        """Commit-then-open broadcast (ref channel.rs:50-75): each party
        commits to its payload with a salted algebraic hash, digests are
        exchanged, then payloads, and every party verifies the payloads
        against the committed digests.  Returns (gathered, ok_flag) — the
        caller queues ok on the context (abort-on-cheat).

        `tamper_fn` is a TEST hook: applied to the payloads AFTER the
        commitment round, simulating a party substituting data post-commit
        (must trip ok=False)."""
        from ..algebra.field import FR
        from ..utils import arith_hash

        flat = arith_hash.pack_stream(sh, batch_dims=1)   # (P, M, L)
        def mk_salt(i):
            arr = np.frombuffer(
                np.random.default_rng(7 + i).bytes(2 * FR.L), "<u2"
            ).astype(np.uint32)
            arr = arr.copy()
            arr[12:] = 0  # keep the salt value well below the modulus
            return jnp.asarray(arr)

        salts = jnp.stack([mk_salt(i) for i in range(self.n)])
        digests = arith_hash.tree_hash(flat, salts)      # commit phase
        self.stats.broadcasts += 2
        per_party = _nbytes(sh) // self.n + _nbytes(digests) // self.n
        self.stats.bytes_sent += per_party * (self.n - 1)
        self.stats.bytes_recv += per_party * (self.n - 1)
        opened = tamper_fn(sh) if tamper_fn is not None else sh
        reflat = arith_hash.pack_stream(opened, batch_dims=1)
        recheck = arith_hash.tree_hash(reflat, salts)    # open phase verify
        ok = jnp.all(recheck == digests)
        return opened, ok

    def check_eq(self, value):
        """Debug cross-party consistency assert on an opened value
        (ref wire/macros.rs:10-38): in the stacked sim every party computes
        from the same gathered stack, so equality is structural."""
        return jnp.asarray(True)

    def exchange(self, sh):
        """2-party duplex exchange (ref mpc-net/src/two.rs:239-319
        exchange_bytes; channel.rs:95-125): each party sends its value and
        receives the peer's.  Stacked: swap the two party rows."""
        assert self.n == 2, "exchange is the 2-party primitive"
        self.stats.broadcasts += 1
        b = _nbytes(sh) // 2
        self.stats.bytes_sent += b
        self.stats.bytes_recv += b
        return jnp.flip(sh, axis=0)

    def atomic_exchange(self, sh, tamper_fn=None):
        """Commit-then-open duplex exchange (ref channel.rs:106-125
        atomic_exchange): digest exchange, payload exchange, verify."""
        from ..algebra.field import FR
        from ..utils import arith_hash

        flat = arith_hash.pack_stream(sh, batch_dims=1)
        salts = jnp.zeros((2, FR.L), jnp.uint32)
        digests = arith_hash.tree_hash(flat, salts)
        self.stats.broadcasts += 1
        b = _nbytes(sh) // 2 + _nbytes(digests) // 2
        self.stats.bytes_sent += b
        self.stats.bytes_recv += b
        opened = self.exchange(sh)
        if tamper_fn is not None:
            opened = tamper_fn(opened)
        reflat = arith_hash.pack_stream(jnp.flip(opened, axis=0), batch_dims=1)
        recheck = arith_hash.tree_hash(reflat, salts)
        return opened, jnp.all(recheck == digests)

    def gather_to_king(self, sh):
        """Star gather (ref multi.rs:175-216 send_to_king): king obtains the
        full (P, ...) stack; other parties obtain nothing (stacked sim:
        the value is simply available to the king computation)."""
        self.stats.to_king += 1
        per_party = _nbytes(sh) // self.n
        self.stats.bytes_sent += per_party          # non-king parties send
        self.stats.bytes_recv += per_party * (self.n - 1)  # king receives
        return sh

    def scatter_from_king(self, full):
        """Star scatter (ref multi.rs:217-242 recv_from_king): king sends
        row i of `full` (P, ...) to party i."""
        self.stats.from_king += 1
        per_party = _nbytes(full) // self.n
        self.stats.bytes_sent += per_party * (self.n - 1)
        self.stats.bytes_recv += per_party
        return full

    # -- share plumbing ----------------------------------------------------
    def stack_public(self, pub):
        """Replicate a public value into a per-party array (no comms)."""
        return jnp.broadcast_to(pub[None], (self.n,) + pub.shape)

    def where_king(self, value, other):
        """Select `value` on party 0, `other` elsewhere (no comms)."""
        extra = value.ndim - 1 if hasattr(value, "ndim") else 0
        mask = self.is_king(extra)
        return jnp.where(mask, value, other)


class _StarChannel:
    """Point-to-point TCP star between the king (party 0) and every other
    party — the deployment analog of the reference's per-peer TCP streams
    (ref mpc-net/src/multi.rs:175-242 send_to_king/recv_from_king): in a
    star gather the king is the ONLY party that sees the others' payloads.

    Framing: 8-byte big-endian length prefix + raw payload bytes.  The
    king listens; peers connect (with retries) and identify themselves
    with a one-byte party id.
    """

    def __init__(self, n: int, party_id: int, host: str, port: int):
        import socket
        import time as _time

        self.n = n
        self.id = party_id
        if party_id == 0:
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind(("", port))
            srv.listen(n)
            self.conns = [None] * n
            for _ in range(n - 1):
                c, _addr = srv.accept()
                c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                pid = c.recv(1)[0]
                self.conns[pid] = c
            srv.close()
        else:
            for attempt in range(600):
                try:
                    c = socket.create_connection((host, port), timeout=5)
                    break
                except OSError:
                    _time.sleep(0.1)
            else:
                raise RuntimeError(f"star connect to {host}:{port} failed")
            c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            c.sendall(bytes([party_id]))
            self.king = c

    @staticmethod
    def _send(sock, data: bytes):
        sock.sendall(len(data).to_bytes(8, "big") + data)

    @staticmethod
    def _recv(sock) -> bytes:
        hdr = b""
        while len(hdr) < 8:
            got = sock.recv(8 - len(hdr))
            assert got, "star peer closed"
            hdr += got
        n = int.from_bytes(hdr, "big")
        chunks = []
        while n:
            got = sock.recv(min(n, 1 << 20))
            assert got, "star peer closed"
            chunks.append(got)
            n -= len(got)
        return b"".join(chunks)

    def gather(self, payload: bytes):
        """King returns [payload_0, ..., payload_{n-1}]; others None."""
        if self.id == 0:
            out = [payload]
            out.extend(self._recv(self.conns[i]) for i in range(1, self.n))
            return out
        self._send(self.king, payload)
        return None

    def scatter(self, payloads):
        """King sends payloads[i] to party i, returns payloads[0]; others
        receive and return their payload."""
        if self.id == 0:
            for i in range(1, self.n):
                self._send(self.conns[i], payloads[i])
            return payloads[0]
        return self._recv(self.king)


class ProcNet:
    """Real multi-process party net: one OS process per party over a
    jax.distributed cluster.  Broadcast-pattern collectives (all_gather /
    atomic commit-open) run via jax.experimental.multihost_utils; king
    STAR ops run over true point-to-point TCP streams (`_StarChannel`),
    so a non-king party never receives the degree-2t shares the king
    collects — matching the privacy shape of the reference's TCP star
    (ref mpc-net/src/multi.rs:175-242).  Between a star gather and the
    following scatter, non-king parties execute the king's arithmetic on
    zeros (keeping their local RNG streams in lockstep) and the scatter
    overwrites their result with the king's dealt rows.

    Shares are the local per-party slices (no party axis), like MeshNet —
    collectives run eagerly, so the FULL eager prover stack
    (Groth16/Plonk/Marlin with host-side Fiat-Shamir between rounds) runs
    unchanged across processes.  This is the deployment analog of the
    reference's blocking-TCP mesh driven by the `proof`/`client` binaries
    (ref mpc-net/src/multi.rs; mpc-snarks/test.zsh runs the SNARK matrix
    as 2 OS processes).
    """

    def __init__(self, n_parties: int, party_id: int, star_addr=None):
        self.n = n_parties
        self.id = party_id
        self._star_addr = star_addr      # (host, port) or None
        self._star = None
        self.stats = Stats()
        # Link shaping (the mahimahi analog, ref mpc-snarks/scripts/
        # bandwidth_bench.zsh): CZTPU_LINK_MBPS throttles this party's
        # effective link by sleeping bytes_sent / rate per collective.
        import os as _os

        rate = _os.environ.get("CZTPU_LINK_MBPS")
        self.link_bytes_per_s = float(rate) * 1e6 if rate else None

    def _shape(self, nbytes: int):
        if self.link_bytes_per_s:
            import time as _time

            _time.sleep(nbytes / self.link_bytes_per_s)

    def n_parties(self) -> int:
        return self.n

    def party_iota(self, extra_dims: int = 0):
        idx = jnp.asarray(self.id, dtype=jnp.uint32)
        return idx.reshape((1,) * max(extra_dims, 0)) if extra_dims else idx

    def is_king(self, extra_dims: int = 0):
        return self.party_iota(extra_dims) == 0

    def all_gather(self, sh):
        self.stats.broadcasts += 1
        b = _nbytes(sh)
        self.stats.bytes_sent += b * (self.n - 1)
        self.stats.bytes_recv += b * (self.n - 1)
        self._shape(b * (self.n - 1))
        return self._tcp_allgather(sh)

    def atomic_gather(self, sh, tamper_fn=None):
        """Commit-then-open broadcast (ref channel.rs:50-75): digest round,
        payload round, verify payloads against committed digests.

        ProcNet runs its collectives EAGERLY on the host, so the commit
        uses SHA-256 exactly like the reference (channel.rs:56-58 hashes
        the serialized payload + a salt) — the algebraic MiMC commitment
        (utils/arith_hash.py) is only needed where hashing must trace
        into jit (StackedNet / MeshNet).  MiMC executed ~0.2 s of tiny
        sequential field ops per call on CPU, which dominated
        multi-process SPDZ proves."""
        import hashlib

        arr = np.asarray(sh)
        digest = np.frombuffer(
            hashlib.sha256(bytes([self.id]) + arr.tobytes()).digest(),
            np.uint8,
        )
        self.stats.broadcasts += 2
        b = _nbytes(sh) + digest.nbytes
        self.stats.bytes_sent += b * (self.n - 1)
        self.stats.bytes_recv += b * (self.n - 1)
        self._shape(b * (self.n - 1))
        digests = np.asarray(self._tcp_allgather(digest))      # commit
        opened = self._tcp_allgather(arr)                      # open
        if tamper_fn is not None:
            opened = tamper_fn(opened)
        op_np = np.asarray(opened)
        ok = all(
            hashlib.sha256(bytes([i]) + op_np[i].tobytes()).digest()
            == digests[i].tobytes()
            for i in range(self.n)
        )
        return jnp.asarray(opened), jnp.asarray(ok)

    def check_eq(self, value):
        g = self._tcp_allgather(value)
        return jnp.all(g == g[:1])

    def exchange(self, sh):
        assert self.n == 2, "exchange is the 2-party primitive"
        self.stats.broadcasts += 1
        b = _nbytes(sh)
        self.stats.bytes_sent += b
        self.stats.bytes_recv += b
        self._shape(b)
        g = self._tcp_allgather(sh)
        return g[1 - self.id]

    def atomic_exchange(self, sh, tamper_fn=None):
        opened, ok = self.atomic_gather(sh, tamper_fn=tamper_fn)
        return opened[1 - self.id], ok

    def _star_chan(self):
        if self._star is None:
            if self._star_addr is None:
                raise RuntimeError(
                    "ProcNet star ops need a star_addr (host, port); "
                    "cli.party derives one from the hosts file"
                )
            self._star = _StarChannel(self.n, self.id, *self._star_addr)
        return self._star

    def _tcp_allgather(self, sh):
        """All-gather over the TCP star (gather to king + broadcast back).
        The previous jax.distributed `process_allgather` paid ~10^2 ms of
        cross-process setup/barrier per call, which dominated multi-process
        proves (27 s for a 2^10 SPDZ Groth16 whose collective payload is
        only ~260 KB); raw sockets match the reference's blocking-TCP
        transport (ref mpc-net/src/multi.rs broadcast)."""
        ch = self._star_chan()
        arr = np.asarray(sh)
        if self.id == 0:
            stacked = b"".join(ch.gather(arr.tobytes()))
            ch.scatter([stacked] * self.n)
        else:
            ch.gather(arr.tobytes())
            stacked = ch.scatter(None)
        out = np.frombuffer(stacked, arr.dtype).reshape((self.n,) + arr.shape)
        return jnp.asarray(out)

    def gather_to_king(self, sh):
        """True point-to-point star gather: the king receives every
        party's rows; non-king parties send theirs and get ZEROS back
        (their subsequent king-side arithmetic is discarded by the next
        scatter_from_king).  Ref mpc-net/src/multi.rs:206-226."""
        self.stats.to_king += 1
        b = _nbytes(sh)
        self.stats.bytes_sent += b if self.id != 0 else 0
        self.stats.bytes_recv += b * (self.n - 1) if self.id == 0 else 0
        self._shape(b * (self.n - 1) if self.id == 0 else b)
        arr = np.asarray(sh)
        rows = self._star_chan().gather(arr.tobytes())
        if self.id != 0:
            return jnp.zeros((self.n,) + arr.shape, arr.dtype)
        stacked = np.stack(
            [np.frombuffer(r, arr.dtype).reshape(arr.shape) for r in rows]
        )
        return jnp.asarray(stacked)

    def scatter_from_king(self, full):
        """True star scatter: the king sends row i of its (P, ...) array
        to party i only; non-king input is ignored.
        Ref mpc-net/src/multi.rs:228-242."""
        self.stats.from_king += 1
        b = _nbytes(full) // self.n
        self.stats.bytes_sent += b * (self.n - 1) if self.id == 0 else 0
        self.stats.bytes_recv += b if self.id != 0 else 0
        self._shape(b * (self.n - 1) if self.id == 0 else b)
        arr = np.asarray(full)
        row = arr[self.id]
        if self.id == 0:
            self._star_chan().scatter(
                [arr[i].tobytes() for i in range(self.n)]
            )
            return jnp.asarray(row)
        got = self._star_chan().scatter(None)
        return jnp.asarray(np.frombuffer(got, arr.dtype).reshape(row.shape))

    def stack_public(self, pub):
        return pub  # replicated by construction

    def where_king(self, value, other):
        return value if self.id == 0 else other


class MeshNet:
    """Parties = one axis of a jax Mesh; use inside shard_map only.

    Shares here are the per-party local slices (no party axis); collectives
    are jax.lax collectives over `axis_name`, riding ICI/DCN.
    """

    def __init__(self, n_parties: int, axis_name: str = "party"):
        self.n = n_parties
        self.axis = axis_name
        self.stats = Stats()

    def n_parties(self) -> int:
        return self.n

    def party_iota(self, extra_dims: int = 0):
        idx = jax.lax.axis_index(self.axis).astype(jnp.uint32)
        return idx.reshape((1,) * max(extra_dims, 0)) if extra_dims else idx

    def is_king(self, extra_dims: int = 0):
        return self.party_iota(extra_dims) == 0

    def all_gather(self, sh):
        self.stats.broadcasts += 1
        b = _nbytes(sh)
        self.stats.bytes_sent += b * (self.n - 1)
        self.stats.bytes_recv += b * (self.n - 1)
        return jax.lax.all_gather(sh, self.axis, axis=0)

    def atomic_gather(self, sh, tamper_fn=None):
        """Real two-phase commit-then-open over the party axis
        (ref channel.rs:50-75): salted algebraic digest of the local
        payload, digest all_gather, payload all_gather, verify every
        received payload against its committed digest.  Returns
        (gathered (P, ...), ok_flag)."""
        from ..algebra.field import FR
        from ..utils import arith_hash

        flat = arith_hash.pack_stream(sh, batch_dims=0)   # (M, L)
        # public salts keyed by party index (binding, not hiding — hiding
        # salts ride preprocessed randomness in a deployment)
        salt = (
            jax.lax.axis_index(self.axis).astype(jnp.uint32)
            + jnp.zeros((FR.L,), jnp.uint32)
        )
        digest = arith_hash.tree_hash(flat, salt)
        self.stats.broadcasts += 2
        b = _nbytes(sh) + _nbytes(digest)
        self.stats.bytes_sent += b * (self.n - 1)
        self.stats.bytes_recv += b * (self.n - 1)
        digests = jax.lax.all_gather(digest, self.axis, axis=0)   # commit
        opened = jax.lax.all_gather(sh, self.axis, axis=0)        # open
        if tamper_fn is not None:
            opened = tamper_fn(opened)
        salts = (
            jnp.arange(self.n, dtype=jnp.uint32)[:, None]
            + jnp.zeros((self.n, FR.L), jnp.uint32)
        )
        reflat = arith_hash.pack_stream(opened, batch_dims=1)
        recheck = arith_hash.tree_hash(reflat, salts)
        ok = jnp.all(recheck == digests)
        return opened, ok

    def check_eq(self, value):
        """Debug cross-party consistency assert on an opened value
        (ref wire/macros.rs:10-38 check_eq): broadcast and compare."""
        g = jax.lax.all_gather(value, self.axis, axis=0)
        return jnp.all(g == value[None])

    def exchange(self, sh):
        """2-party duplex exchange (ref two.rs:239-319): ppermute swap."""
        assert self.n == 2, "exchange is the 2-party primitive"
        self.stats.broadcasts += 1
        b = _nbytes(sh)
        self.stats.bytes_sent += b
        self.stats.bytes_recv += b
        return jax.lax.ppermute(sh, self.axis, perm=[(0, 1), (1, 0)])

    def gather_to_king(self, sh):
        """Star gather: ONLY the king receives the shares (non-king
        parties receive zeros) — fixes the round-1 all_gather leak where
        every party saw the degree-2t shares (ref multi.rs:175-216
        send_to_king semantics)."""
        self.stats.to_king += 1
        b = _nbytes(sh)
        self.stats.bytes_sent += b
        self.stats.bytes_recv += b * (self.n - 1)
        # party i contributes its share at destination-row 0 (the king)
        # and zeros elsewhere; all_to_all delivers row j of each source to
        # party j: the king gets every share, others get zeros.
        expanded = jnp.zeros((self.n,) + sh.shape, sh.dtype).at[0].set(sh)
        return jax.lax.all_to_all(
            expanded, self.axis, split_axis=0, concat_axis=0
        )

    def scatter_from_king(self, full):
        """Star scatter: the king's rows are delivered one per party;
        non-king parties' (zero) contributions are ignored."""
        self.stats.from_king += 1
        b = _nbytes(full) // self.n
        self.stats.bytes_sent += b * (self.n - 1)
        self.stats.bytes_recv += b
        contrib = jnp.where(
            self.is_king(full.ndim), full, jnp.zeros_like(full)
        )
        out = jax.lax.all_to_all(
            contrib, self.axis, split_axis=0, concat_axis=0
        )
        # every party received (P, ...) rows: row i is party i's
        # contribution of OUR slot; only the king's (row 0) is real.
        return out[0]

    def stack_public(self, pub):
        return pub  # replicated by construction

    def where_king(self, value, other):
        extra = value.ndim if hasattr(value, "ndim") else 0
        mask = self.is_king(0)
        return jnp.where(mask, value, other)
