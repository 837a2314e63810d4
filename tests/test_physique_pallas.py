"""NHCW/Pallas physique path vs the NHWC flax path: same parameter tree,
same outputs and gradients (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from x_as_supervision_tpu.models.physique import PhysiqueMaskGenerator

RNG = np.random.default_rng(3)


def _setup(nf=(8, 16), s=16, b=2):
    x = jnp.asarray(RNG.normal(size=(b, s, s, 1)).astype(np.float32))
    m_ref = PhysiqueMaskGenerator(num_features=nf)
    m_pal = PhysiqueMaskGenerator(num_features=nf, use_pallas=True)
    variables = m_ref.init(jax.random.PRNGKey(0), x, train=True)
    return x, m_ref, m_pal, variables


def test_param_tree_identical():
    x, m_ref, m_pal, variables = _setup()
    v2 = m_pal.init(jax.random.PRNGKey(0), x, train=True)
    t1 = jax.tree.structure(variables)
    t2 = jax.tree.structure(v2)
    assert t1 == t2
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v2)):
        assert a.shape == b.shape


def test_forward_equivalence_train_and_eval():
    x, m_ref, m_pal, variables = _setup()
    for train in (True, False):
        kw = {} if not train else {"mutable": ["batch_stats"]}
        y1 = m_ref.apply(variables, x, train=train, **kw)
        y2 = m_pal.apply(variables, x, train=train, **kw)
        if train:
            y1, bs1 = y1
            y2, bs2 = y2
            for a, b in zip(jax.tree.leaves(bs1), jax.tree.leaves(bs2)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-4
                )
        np.testing.assert_allclose(
            np.asarray(y1), np.asarray(y2), atol=1e-4
        )


def test_gradient_equivalence():
    x, m_ref, m_pal, variables = _setup(nf=(4, 8), s=8, b=1)
    tgt = jnp.asarray(RNG.uniform(size=(1, 8, 8, 1)).astype(np.float32))

    def loss(m):
        def f(params):
            y, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            return ((y - tgt) ** 2).mean()
        return f

    g1 = jax.grad(loss(m_ref))(variables["params"])
    g2 = jax.grad(loss(m_pal))(variables["params"])
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in flat1:
        b = flat2[path]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4,
            err_msg=str(path),
        )
