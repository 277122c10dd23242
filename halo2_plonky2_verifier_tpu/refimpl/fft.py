"""Number-theoretic transforms over Goldilocks (pure-int reference).

Conventions match plonky2's PolynomialValues/PolynomialCoeffs:
  - fft(coeffs): values[i] = poly(g^i) over the size-n two-adic subgroup in
    natural order (g = primitive_root_of_unity(log n)).
  - coset_fft(coeffs, shift): values[i] = poly(shift * g^i).
  - ifft / coset_ifft are the inverses.
"""

from . import field as gl


def reverse_index_bits(xs):
    """Permute xs so element at index i moves to bit-reversed index."""
    n = len(xs)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    out = [None] * n
    for i, x in enumerate(xs):
        j = int(format(i, f"0{log_n}b")[::-1], 2) if log_n else 0
        out[j] = x
    return out


def fft(coeffs):
    n = len(coeffs)
    if n == 1:
        return list(coeffs)
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    p = gl.P
    a = reverse_index_bits([c % p for c in coeffs])
    size = 2
    while size <= n:
        w_m = gl.primitive_root_of_unity(size.bit_length() - 1)
        half = size // 2
        for start in range(0, n, size):
            w = 1
            for j in range(half):
                t = a[start + j + half] * w % p
                u = a[start + j]
                a[start + j] = (u + t) % p
                a[start + j + half] = (u - t) % p
                w = w * w_m % p
        size *= 2
    return a


def ifft(values):
    n = len(values)
    a = fft(values)
    n_inv = gl.inv(n % gl.P)
    # fft of values then reverse order gives n * coeffs of the inverse
    out = [a[0] * n_inv % gl.P] + [a[n - i] * n_inv % gl.P for i in range(1, n)]
    return out


def _native():
    from . import native_backend as nb
    return nb if nb.available() else None


def coset_fft(coeffs, shift):
    nb = _native()
    if nb is not None and len(coeffs) > 8:
        import numpy as np
        return [int(x) for x in nb.coset_fft(
            np.array(coeffs, dtype=np.uint64), shift % gl.P)]
    p = gl.P
    shifted = []
    s = 1
    for c in coeffs:
        shifted.append(c * s % p)
        s = s * shift % p
    return fft(shifted)


def coset_ifft(values, shift):
    nb = _native()
    if nb is not None and len(values) > 8:
        import numpy as np
        return [int(x) for x in nb.coset_ifft(
            np.array(values, dtype=np.uint64), shift % gl.P)]
    p = gl.P
    coeffs = ifft(values)
    s_inv = gl.inv(shift)
    out = []
    s = 1
    for c in coeffs:
        out.append(c * s % p)
        s = s * s_inv % p
    return out


def lde(coeffs, rate_bits):
    """Zero-pad coefficients to length * 2^rate_bits (plonky2 PolynomialCoeffs::lde)."""
    return list(coeffs) + [0] * (len(coeffs) * ((1 << rate_bits) - 1))


def eval_poly(coeffs, x):
    """Horner evaluation in the base field."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % gl.P
    return acc


def eval_poly_ext(coeffs, x_ext):
    """Evaluate a base-field-coefficient polynomial at an extension point."""
    acc = gl.EXT_ZERO
    for c in reversed(coeffs):
        acc = gl.ext_add(gl.ext_mul(acc, x_ext), gl.ext_from_base(c))
    return acc


def eval_poly_ext_coeffs(coeffs, x_ext):
    """Evaluate an extension-coefficient polynomial at an extension point."""
    acc = gl.EXT_ZERO
    for c in reversed(coeffs):
        acc = gl.ext_add(gl.ext_mul(acc, x_ext), c)
    return acc
