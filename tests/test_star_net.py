"""ProcNet king-star privacy: the star gather/scatter are true
point-to-point TCP streams — a NON-KING party must never receive the
other parties' gathered rows (VERDICT r3 item 5; ref
mpc-net/src/multi.rs:175-242 send_to_king/recv_from_king semantics)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPET = r"""
import os, sys
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(%r, ".jax_cache"))
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
jax.distributed.initialize(f"127.0.0.1:{port}", n, pid)
import jax.numpy as jnp, numpy as np
from collaborative_zksnark_tpu.parallel.net import ProcNet
net = ProcNet(n, pid, star_addr=("127.0.0.1", port + 1000))
sh = jnp.full((4,), 100 + pid, jnp.uint32)
g = net.gather_to_king(sh)
if pid == 0:
    assert np.asarray(g).tolist() == [[100 + i] * 4 for i in range(n)], "king gather"
else:
    # the star keeps peers' shares king-only: non-king sees zeros
    assert not np.asarray(g).any(), "non-king received peer shares"
full = (jnp.arange(n * 4, dtype=jnp.uint32).reshape(n, 4)
        if pid == 0 else jnp.zeros((n, 4), jnp.uint32))
row = net.scatter_from_king(full)
assert np.asarray(row).tolist() == [pid * 4 + j for j in range(4)], "scatter row"
# non-king bytes: sent one 16-byte row, received one 16-byte row — not n rows
if pid != 0:
    assert net.stats.bytes_recv == 16, net.stats.bytes_recv
    assert net.stats.bytes_sent == 16, net.stats.bytes_sent
print(f"party {pid}: STAR OK", flush=True)
jax.distributed.shutdown()
""" % (REPO,)


def test_star_gather_scatter_private():
    n, port = 3, 12475
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", SNIPPET, str(i), str(n), str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(n)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"party {i} failed:\n{out[-2000:]}"
        assert f"party {i}: STAR OK" in out
