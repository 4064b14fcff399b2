"""Pallas hot-op kernels vs the XLA reference implementations
(interpreter mode on the CPU test backend)."""

import numpy as np
import pytest

import jax.numpy as jnp

from exon_tpu.ops import pallas_kernels as pk


def test_masked_group_count_matches_numpy():
    rng = np.random.default_rng(0)
    n, g = 50_000, 24
    codes = rng.integers(0, g, size=n).astype(np.int32)
    mask = rng.random(n) < 0.37
    got = np.asarray(pk.masked_group_count(
        jnp.asarray(codes), jnp.asarray(mask), g, interpret=True))
    want = np.bincount(codes[mask], minlength=g)
    np.testing.assert_array_equal(got, want)


def test_masked_group_count_empty():
    got = np.asarray(pk.masked_group_count(
        jnp.zeros(0, jnp.int32), jnp.zeros(0, bool), 8, interpret=True))
    np.testing.assert_array_equal(got, np.zeros(8, np.int32))


def test_prefix_match_count_case_insensitive():
    rng = np.random.default_rng(1)
    n, k, g = 20_000, 4, 16
    prefix = rng.integers(65, 91, size=(n, k)).astype(np.uint8)
    lengths = rng.integers(0, 300, size=n).astype(np.int32)
    codes = rng.integers(0, g, size=n).astype(np.int32)
    # lowercase some rows to exercise case folding
    lower = rng.random(n) < 0.5
    prefix[lower] = prefix[lower] + 32
    lit = np.frombuffer(b"M", np.uint8)
    got = np.asarray(pk.prefix_match_count(
        jnp.asarray(prefix), jnp.asarray(lengths), jnp.asarray(codes),
        jnp.asarray(lit), g, interpret=True))
    first = prefix[:, 0]
    first_up = np.where((first >= 97) & (first <= 122), first - 32, first)
    hit = (first_up == ord("M")) & (lengths >= 1)
    want = np.bincount(codes[hit], minlength=g)
    np.testing.assert_array_equal(got, want)


def test_prefix_match_count_multibyte_literal():
    prefix = np.array([[ord("A"), ord("T"), ord("G"), 0],
                       [ord("A"), ord("T"), ord("C"), 0],
                       [ord("a"), ord("t"), ord("g"), 0]], np.uint8)
    lengths = np.array([10, 10, 2], np.int32)  # row 2 shorter than literal
    codes = np.array([0, 1, 0], np.int32)
    lit = np.frombuffer(b"ATG", np.uint8)
    got = np.asarray(pk.prefix_match_count(
        jnp.asarray(prefix), jnp.asarray(lengths), jnp.asarray(codes),
        jnp.asarray(lit), 4, interpret=True))
    np.testing.assert_array_equal(got, [1, 0, 0, 0])
