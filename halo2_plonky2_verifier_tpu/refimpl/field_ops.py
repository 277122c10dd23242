"""Field-ops adapters so Stark.eval runs over base ints or extension tuples."""

from . import field as gl


def generic_fold(body, carry, xs):
    """Sequential fold over per-step pytrees of F-values:
    body(carry, x) -> (carry, y); returns (carry, [y...]).  The jnp adapter
    (stark.ExtOpsJax.fold) overrides this with ONE lax.scan so repeated
    gate-eval structure never unrolls into the jaxpr (graph-size
    discipline)."""
    ys = []
    for x in xs:
        carry, y = body(carry, x)
        ys.append(y)
    return carry, ys


class BaseOps:
    """GF(p) with plain ints."""

    fold = staticmethod(generic_fold)

    @classmethod
    def mul_elems(cls, xs, ys):
        """Elementwise [x*y for x, y in zip(xs, ys)] — the jnp adapter
        overrides with ONE stacked multiply (stark.ExtOpsJax.mul_elems)."""
        return [cls.mul(x, y) for x, y in zip(xs, ys)]

    @staticmethod
    def zero():
        return 0

    @staticmethod
    def one():
        return 1

    @staticmethod
    def add(a, b):
        return (a + b) % gl.P

    @staticmethod
    def sub(a, b):
        return (a - b) % gl.P

    @staticmethod
    def mul(a, b):
        return a * b % gl.P

    @staticmethod
    def from_base(x):
        return x % gl.P

    @staticmethod
    def mul_const_small(c, a):
        return a * c % gl.P


class ExtOps:
    """GF(p^2) with (a0, a1) tuples."""

    fold = staticmethod(generic_fold)

    @classmethod
    def mul_elems(cls, xs, ys):
        return [cls.mul(x, y) for x, y in zip(xs, ys)]

    @staticmethod
    def zero():
        return gl.EXT_ZERO

    @staticmethod
    def one():
        return gl.EXT_ONE

    @staticmethod
    def add(a, b):
        return gl.ext_add(a, b)

    @staticmethod
    def sub(a, b):
        return gl.ext_sub(a, b)

    @staticmethod
    def mul(a, b):
        return gl.ext_mul(a, b)

    @staticmethod
    def from_base(x):
        return gl.ext_from_base(x)

    @staticmethod
    def mul_const_small(c, a):
        return gl.ext_scalar_mul(a, c)
