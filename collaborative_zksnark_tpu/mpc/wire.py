"""Wire layer: the scheme-dispatching functional API used by the SNARKs.

The reference's `MpcField`/`MpcGroup` enum wire types (ref wire/field.rs,
wire/group.rs, wire/pairing.rs) dispatch Public/Shared at *runtime*; under
XLA we keep shared-ness static per tensor (a trace-time property — no
recompilation-inducing control flow, SURVEY.md §7 hard-part 6).  The proven-
sufficient hook inventory (SURVEY.md §7 item 7) maps to scheme methods:

  batch_product_in_place      -> scheme.mul (batched Beaver / GSZ king round)
  batch_division_in_place     -> scheme.div
  partial_products_in_place   -> scheme.partial_products
  univariate_div_qr           -> poly ops in snark/poly_share.py (public
                                 divisors are linear over shares)
  msm(pub base, shared scal.) -> scheme.g_msm (local per party)
  open / reveal               -> scheme.reveal / g_reveal (+ queued checks)
  king_share                  -> scheme.king_share
  pairing of shares           -> host-side after reveal (verification path)

`make_scheme` is the analog of the per-scheme type-alias namespaces
(ref mpc-algebra/src/lib.rs:14-63 honest_but_curious / malicious_majority /
honest_majority).
"""

from __future__ import annotations

from .additive import AdditiveScheme
from .context import MpcContext
from .gsz import GszScheme
from .local import LocalScheme
from .spdz import SpdzScheme

SCHEMES = {
    "hbc": AdditiveScheme,       # honest-but-curious additive
    "additive": AdditiveScheme,
    "spdz": SpdzScheme,          # malicious majority
    "gsz": GszScheme,            # honest majority (Shamir)
    "local": LocalScheme,        # degenerate 1-party (no MPC)
}


def make_scheme(name: str, ctx: MpcContext):
    return SCHEMES[name](ctx)


def rand_share(scheme, shape=()):
    """A share of a jointly-random value (dealt by the king here; a real
    deployment uses preprocessed randomness)."""
    return scheme.king_share(scheme.ctx.rand_fr(shape))
