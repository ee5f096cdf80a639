"""softfloat: vectorized IEEE binary64 emulation must match hardware f64
bit-for-bit on the plane-fit domain (normals + signed zeros, RNE)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jackal_tpu.ops import softfloat as sf


def _bits(x):
    return np.asarray(x, np.float64).view(np.int64)


def _vals(b):
    return np.asarray(b, np.int64).view(np.float64)


def _run(fn, *args):
    """Run under scoped x64 (global flag stays off) — the input conversion
    must also happen inside the scope or int64 operands truncate."""
    with jax.enable_x64(True):
        out = jax.jit(fn)(*[jnp.asarray(x) for x in args])
        return np.asarray(out)


def _rand_operands(rng, n):
    """Values shaped like Gauss-Jordan intermediates: ratios and products
    of small integers across many magnitudes."""
    ints = rng.integers(-2000, 2000, size=n).astype(np.float64)
    dens = rng.integers(1, 2000, size=n).astype(np.float64)
    scale = np.exp2(rng.integers(-40, 40, size=n).astype(np.float64))
    vals = (ints / dens) * scale
    vals[rng.random(n) < 0.05] = 0.0
    vals[rng.random(n) < 0.02] = -0.0
    return vals


@pytest.mark.parametrize("op,npop", [
    ("f64_add", np.add),
    ("f64_sub", np.subtract),
    ("f64_mul", np.multiply),
])
def test_softfloat_binary_ops_random(rng, op, npop):
    n = 20000
    a = _rand_operands(rng, n)
    b = _rand_operands(rng, n)
    got = _vals(_run(getattr(sf, op), _bits(a), _bits(b)))
    want = npop(a, b)
    np.testing.assert_array_equal(got.view(np.int64), want.view(np.int64))


def test_softfloat_div_random(rng):
    n = 20000
    a = _rand_operands(rng, n)
    b = _rand_operands(rng, n)
    b[b == 0.0] = 1.0
    got = _vals(_run(sf.f64_div, _bits(a), _bits(b)))
    want = a / b
    np.testing.assert_array_equal(got.view(np.int64), want.view(np.int64))


def test_softfloat_adversarial_cases():
    # exact ties (RNE), massive cancellation, zero signs, carries
    pairs = [
        (1.0, 2.0 ** -53),              # round-to-even tie on add
        (1.0 + 2.0 ** -52, 2.0 ** -53),  # tie rounds up (odd LSB)
        (1.0, -(1.0 - 2.0 ** -53)),     # cancellation to tiny
        (1.0, -1.0),                    # exact cancellation -> +0
        (0.0, -0.0), (-0.0, -0.0), (0.0, 0.0),
        (3.0, 7.0), (-3.0, 7.0),
        (2.0 ** 30, 2.0 ** -30),
        (1.9999999999999998, 1.9999999999999998),  # mul carry
        (0.1, 0.2),
        (5.0, -0.0), (-0.0, 5.0),
    ]
    a = np.array([p[0] for p in pairs])
    b = np.array([p[1] for p in pairs])
    for op, npop in [(sf.f64_add, np.add), (sf.f64_sub, np.subtract),
                     (sf.f64_mul, np.multiply)]:
        got = _vals(_run(op, _bits(a), _bits(b)))
        np.testing.assert_array_equal(
            got.view(np.int64), npop(a, b).view(np.int64), err_msg=str(op))
    bd = np.where(b == 0.0, 1.0, b)
    got = _vals(_run(sf.f64_div, _bits(a), _bits(bd)))
    np.testing.assert_array_equal(got.view(np.int64), (a / bd).view(np.int64))


def test_softfloat_div_exhaustive_small_ints():
    # every quotient of small ints: exercises exact quotients, ties, and
    # both normalization branches
    n, d = np.meshgrid(np.arange(-63.0, 64.0), np.arange(1.0, 128.0))
    n, d = n.ravel(), d.ravel()
    got = _vals(_run(sf.f64_div, _bits(n), _bits(d)))
    np.testing.assert_array_equal(got.view(np.int64), (n / d).view(np.int64))


def test_softfloat_from_int_to_f32(rng):
    ints = np.concatenate([
        rng.integers(-(2 ** 40), 2 ** 40, size=3000),
        np.array([0, 1, -1, 2 ** 52 - 1, -(2 ** 52 - 1)]),
    ]).astype(np.int64)
    got = _vals(_run(sf.f64_from_i32, ints))
    np.testing.assert_array_equal(got.view(np.int64),
                                  ints.astype(np.float64).view(np.int64))

    vals = _rand_operands(np.random.default_rng(7), 20000)
    # include values that land subnormal in f32
    vals = np.concatenate([vals, vals * np.exp2(-140.0), [0.0, -0.0]])
    got32 = _run(sf.f64_to_f32_bits, _bits(vals)).view(np.float32)
    want32 = vals.astype(np.float32)
    np.testing.assert_array_equal(got32.view(np.int32),
                                  want32.view(np.int32))


def test_f32_div_int_exhaustive():
    # the slope divisions: all (dv, du) corner-coordinate differences
    num, den = np.meshgrid(np.arange(-1024, 1025, 7),
                           np.arange(-1024, 1025, 13))
    num, den = num.ravel().astype(np.int32), den.ravel().astype(np.int32)
    keep = den != 0
    num, den = num[keep], den[keep]
    got = _run(sf.f32_div_int, num, den)
    want = (num.astype(np.float32) / den.astype(np.float32))
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_f64_sqrt_correctly_rounded():
    """f64_sqrt vs numpy/IEEE sqrt (correctly rounded by spec), over wide
    magnitudes, mantissa boundaries and zero."""
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.random(20000) * np.exp2(rng.integers(-900, 900, 20000)
                                    .astype(np.float64)),
        (1.0 + rng.random(10000)) * rng.choice([1.0, 2.0], 10000),
        np.array([0.0, 1.0, 2.0, 4.0, 0.25, 1e308, 1e-300]),
        np.nextafter(np.float64(4.0), 0.0)[None][0:1],
    ])
    got = _run(sf.f64_sqrt, _bits(vals)).view(np.float64)
    want = np.sqrt(vals)
    np.testing.assert_array_equal(got.view(np.int64), want.view(np.int64))


def test_f64_ord_monotone():
    rng = np.random.default_rng(3)
    vals = np.sort(np.concatenate([
        -rng.random(1000) * np.exp2(rng.integers(-300, 300, 1000)
                                    .astype(np.float64)),
        rng.random(1000) * np.exp2(rng.integers(-300, 300, 1000)
                                   .astype(np.float64)),
        np.array([0.0]),
    ]))
    ords = np.asarray(_run(sf.f64_ord, _bits(vals)))
    assert np.all(np.diff(ords) > 0)


def test_f32_div_small_int_correctly_rounded():
    """The adaptive-mean weight-sum division: CR f32 quotients for all
    divisors with odd part <= 15, across magnitudes incl. subnormal
    numerators and subnormal results. (Double rounding through the f64
    reference is safe here: quotients a/c with odd c <= 15 are never
    within 2^-29 relative of an f32 rounding midpoint unless exactly
    representable.)"""
    rng = np.random.default_rng(5)
    nums = np.concatenate([
        rng.standard_normal(100000).astype(np.float32) * rng.choice(
            [1e-38, 1e-30, 1e-6, 1.0, 1e4, 1e30],
            100000).astype(np.float32),
        np.array([0.0, -0.0, 1e-45, -1e-45, 3.4e38, -3.4e38], np.float32),
    ])
    dens = rng.choice(
        [1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 24, 28, 30, 32],
        len(nums)).astype(np.int32)
    with jax.enable_x64(False):
        got = np.asarray(jax.jit(sf.f32_div_small_int)(
            jnp.asarray(nums), jnp.asarray(dens)))
    want = (nums.astype(np.float64) / dens).astype(np.float32)
    np.testing.assert_array_equal(got.view(np.int32), want.view(np.int32))


def test_adaptive_mean_weights_are_0_2_4():
    """The premise of the exact weight division: the broken abs-mask
    yields weights in exactly {0, 2, 4} for every float input."""
    from jackal_tpu.matching.elas.post import _ref_absmask

    rng = np.random.default_rng(2)
    x = np.concatenate([
        rng.standard_normal(200000).astype(np.float32) * rng.choice(
            [1e-30, 1e-8, 1.0, 100.0, 1e30], 200000).astype(np.float32),
        rng.integers(-(2 ** 31), 2 ** 31 - 1, 200000)
        .astype(np.int32).view(np.float32),
        np.array([0.0, -0.0], np.float32),
    ])
    x = x[np.isfinite(x)]
    w = np.asarray(jnp.maximum(0.0, 4.0 - _ref_absmask(jnp.asarray(x))))
    assert set(np.unique(w)) <= {0.0, 2.0, 4.0}
