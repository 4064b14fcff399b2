"""Pallas Smith-Waterman kernel vs the XLA lax.scan reference
(interpreter mode on the CPU test backend)."""

import numpy as np
import jax
import jax.numpy as jnp

from exon_tpu.ops.alignment import sw_scores_vs_query
from exon_tpu.ops.pallas_kernels import sw_scores_pallas


def test_sw_pallas_matches_xla_scan():
    rng = np.random.default_rng(7)
    n, L, m = 64, 128, 12
    seq = rng.integers(65, 69, size=(n, L)).astype(np.uint8)
    lens = rng.integers(5, L, size=n)
    valid = np.arange(L)[None, :] < lens[:, None]
    q = rng.integers(65, 69, size=m).astype(np.uint8)
    ref = np.asarray(sw_scores_vs_query(jnp.asarray(seq), jnp.asarray(valid),
                                        jnp.asarray(q)))
    out = np.asarray(sw_scores_pallas(jnp.asarray(seq), jnp.asarray(valid),
                                      jnp.asarray(q), interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_sw_pallas_exact_match_score():
    seq = np.zeros((8, 128), np.uint8)
    seq[0, :4] = np.frombuffer(b"ATCG", np.uint8)
    valid = np.zeros((8, 128), bool)
    valid[0, :4] = True
    q = np.frombuffer(b"ATCG", np.uint8)
    out = np.asarray(sw_scores_pallas(jnp.asarray(seq), jnp.asarray(valid),
                                      jnp.asarray(q), interpret=True))
    assert out[0] == 4
