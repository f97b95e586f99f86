"""CLI drivers: `proof` (benchmark prover) and `client` (micro-computations),
the analogs of mpc-snarks/src/{proof,client}.rs."""
