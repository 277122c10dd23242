"""Profiling / observability: the TPU-native analog of the reference's
tracing subsystem (SURVEY.md §5).

The reference wraps every chip method in push/pop scopes via the #[count]
proc-macro (macro/src/lib.rs:10-61) and records halo2 advice-cell counts into
a ContextTree (util/context_tree.rs), dumped as text or inferno flamegraphs
(util/context_wrapper.rs:36-80).  Its cost unit is circuit area — a static,
machine-independent measure.

Here the equivalent static cost is *field-operation counts at trace time*:
the ops layers (goldilocks / poseidon / bn254) report each operation with its
static lane count while a profile is active, attributed to the innermost
named scope.  Because JAX tracing visits every op exactly once with fully
known shapes, `jax.eval_shape` over the verifier yields the exact per-scope
op census without executing anything — the direct analog of MockProver's
cell counting.

Outputs: nested text report, collapsed-stack lines (flamegraph.pl/inferno
compatible), and a self-contained SVG flamegraph.  Scopes also enter
`jax.named_scope`, so device-time profiles captured with jax.profiler carry
the same names.
"""

import contextlib
from collections import OrderedDict

import jax

_ACTIVE = None  # the ContextTree currently recording, if any
_MULTIPLIER = 1  # product of enclosing scan trip counts


class _Node:
    __slots__ = ("name", "children", "counts")

    def __init__(self, name):
        self.name = name
        self.children = OrderedDict()
        self.counts = {}

    def child(self, name):
        c = self.children.get(name)
        if c is None:
            c = _Node(name)
            self.children[name] = c
        return c

    def total(self, metric):
        t = self.counts.get(metric, 0)
        for c in self.children.values():
            t += c.total(metric)
        return t


class ContextTree:
    """Scope tree with per-scope operation counts."""

    def __init__(self, name="root"):
        self.root = _Node(name)
        self._stack = [self.root]

    # -- recording -----------------------------------------------------------

    def push(self, name):
        self._stack.append(self._stack[-1].child(name))

    def pop(self):
        assert len(self._stack) > 1, "unbalanced scope pop"
        self._stack.pop()

    def record(self, metric, amount):
        c = self._stack[-1].counts
        c[metric] = c.get(metric, 0) + int(amount)

    # -- reporting -----------------------------------------------------------

    def report(self, metric="gl_mul"):
        """Nested text report with absolute counts and % of total."""
        total = max(self.root.total(metric), 1)
        lines = []

        def walk(node, depth):
            t = node.total(metric)
            if t == 0 and depth > 0:
                return
            lines.append(
                f"{'  ' * depth}{node.name:<40} {t:>14,} ({100.0 * t / total:5.2f}%)")
            for c in node.children.values():
                walk(c, depth + 1)

        walk(self.root, 0)
        return "\n".join(lines)

    def collapsed(self, metric="gl_mul"):
        """flamegraph.pl / inferno collapsed-stack lines (self cost per stack)."""
        lines = []

        def walk(node, prefix):
            stack = f"{prefix};{node.name}" if prefix else node.name
            self_cost = node.counts.get(metric, 0)
            if self_cost:
                lines.append(f"{stack} {self_cost}")
            for c in node.children.values():
                walk(c, stack)

        walk(self.root, "")
        return "\n".join(lines)

    def reversed_tree(self, metric="gl_mul"):
        """Tree with every stack reversed (leaf-up aggregation) — the analog
        of the reference's committed *_rev.svg flamegraph variants
        (util/context_wrapper.rs:63-80 writes both orientations)."""
        rev = ContextTree(self.root.name)

        def walk(node, path):
            path = path + [node.name]
            self_cost = node.counts.get(metric, 0)
            if self_cost:
                cur = rev.root
                for name in reversed(path[1:]):
                    cur = cur.child(name)
                cur.counts[metric] = cur.counts.get(metric, 0) + self_cost
            for c in node.children.values():
                walk(c, path)

        walk(self.root, [])
        return rev

    def write_collapsed(self, path, metric="gl_mul"):
        with open(path, "w") as f:
            f.write(self.collapsed(metric) + "\n")

    def write_flamegraph_svg(self, path, metric="gl_mul", title=None,
                             width=1200, row_h=18):
        """Minimal self-contained SVG flamegraph (the analog of the
        reference's committed inferno SVGs, context_tree.rs:154-179)."""
        total = max(self.root.total(metric), 1)

        rects = []

        def walk(node, x, depth):
            t = node.total(metric)
            w = width * t / total
            if w < 0.4:
                return
            rects.append((x, depth, w, node.name, t))
            cx = x
            for c in node.children.values():
                ct = c.total(metric)
                walk(c, cx, depth + 1)
                cx += width * ct / total

        walk(self.root, 0.0, 0)
        depth_max = max((d for _, d, _, _, _ in rects), default=0)
        height = (depth_max + 2) * row_h + 30
        out = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}" font-family="monospace" font-size="11">',
            f'<text x="{width/2}" y="16" text-anchor="middle" font-size="14">'
            f'{title or metric}</text>',
        ]
        palette = ["#e66", "#e86", "#ea6", "#ec6", "#cd5", "#9c5"]
        for (x, d, w, name, t) in rects:
            y = 24 + d * row_h
            color = palette[d % len(palette)]
            label = name if w > 7 * len(name) else (name[:max(int(w / 7), 0)])
            out.append(
                f'<g><title>{name} ({t:,} {metric}, {100.0*t/total:.2f}%)</title>'
                f'<rect x="{x:.1f}" y="{y}" width="{max(w,0.5):.1f}" '
                f'height="{row_h-2}" fill="{color}" stroke="#fff" stroke-width="0.4"/>'
                f'<text x="{x+2:.1f}" y="{y+row_h-6}">{label}</text></g>')
        out.append("</svg>")
        with open(path, "w") as f:
            f.write("\n".join(out))


# ----------------------------------------------------------------------------
# Recording API used by the ops layers
# ----------------------------------------------------------------------------

def record(metric, amount):
    """Record `amount` of `metric`, scaled by enclosing scan trip counts
    (scan bodies are traced once but execute `length` times)."""
    if _ACTIVE is not None:
        _ACTIVE.record(metric, amount * _MULTIPLIER)


@contextlib.contextmanager
def multiplier(k):
    """Scale recorded counts by k (wrap lax.scan/fori_loop call sites)."""
    global _MULTIPLIER
    prev = _MULTIPLIER
    _MULTIPLIER = prev * int(k)
    try:
        yield
    finally:
        _MULTIPLIER = prev


@contextlib.contextmanager
def suspend():
    """Temporarily disable recording (e.g. inside Pallas kernel bodies whose
    cost is recorded analytically at the call site)."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = None
    try:
        yield
    finally:
        _ACTIVE = prev


def active():
    return _ACTIVE is not None


@contextlib.contextmanager
def scope(name):
    """Named profiling scope; also a jax.named_scope for device profiles."""
    global _ACTIVE
    if _ACTIVE is None:
        with jax.named_scope(name):
            yield
        return
    _ACTIVE.push(name)
    try:
        with jax.named_scope(name):
            yield
    finally:
        _ACTIVE.pop()


@contextlib.contextmanager
def profile(tree=None):
    """Activate op-count recording into `tree` (a new ContextTree if None)."""
    global _ACTIVE
    prev = _ACTIVE
    tree = tree or ContextTree()
    _ACTIVE = tree
    try:
        yield tree
    finally:
        _ACTIVE = prev


def profile_verifier(verify_fn, batch):
    """Trace `verify_fn(batch)` abstractly (no execution) while recording the
    per-scope op census — the MockProver-style static cost profile.

    The lambda wrapper is load-bearing: jax.eval_shape routes through the
    pjit trace cache (keyed on the function object), so profiling a function
    that was already jitted+executed would silently reuse the cached jaxpr
    and record nothing.  A fresh function object forces a fresh trace."""
    with profile() as tree:
        jax.eval_shape(lambda b: verify_fn(b), batch)
    return tree


def count(fn):
    """Decorator form of `scope` — the analog of the reference's #[count]
    proc-macro (macro/src/lib.rs:10-61): wraps the function body in a
    profiling scope named after the function."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with scope(fn.__name__):
            return fn(*args, **kwargs)

    return wrapped
