"""UniCL loss: vectorized implementation vs a straight-line numpy re-derivation
of the reference semantics (``models/proof.py:21-191``)."""

import math

import jax.numpy as jnp
import numpy as np

from team_tpu.losses.unicl import dynamic_temperature, unicl_loss


def _norm(x, axis=-1):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def naive_unicl(img, txt, st, labels, state_ids, temperature=0.07, epoch=None,
                max_epoch=None, evo=None, evo_valid=None):
    """Loop-based reference semantics in plain numpy."""
    b = img.shape[0]
    if b < 2:
        return 0.0, 0.0, 0.0
    img, txt, st = _norm(img), _norm(txt), _norm(st)

    if evo is not None:
        enhanced = st.copy()
        class_indices = {}
        for i, c in enumerate(labels):
            class_indices.setdefault(int(c), []).append(i)
        for c, idxs in class_indices.items():
            if not (c < len(evo_valid) and evo_valid[c]):
                continue
            evo_feat = evo[c]
            if len(idxs) >= 2:
                class_states = [int(state_ids[i]) for i in idxs]
                uniq = sorted(set(class_states))
                if len(uniq) >= 2:
                    t_of = {s: i / (len(uniq) - 1) for i, s in enumerate(uniq)}
                    for i_pos, i in enumerate(idxs):
                        tp = t_of[int(state_ids[i])]
                        mixture = evo_feat.copy()
                        for j_pos, j in enumerate(idxs):
                            if i_pos != j_pos:
                                w = 1.0 - abs(tp - t_of[int(state_ids[j])])
                                if w > 0.3:
                                    mixture = mixture + w * 0.2 * st[j]
                        e = 0.7 * st[i] + 0.3 * _norm(mixture, axis=0)
                        enhanced[i] = _norm(e, axis=0)
            else:
                for i in idxs:
                    e = 0.8 * st[i] + 0.2 * _norm(evo_feat, axis=0)
                    enhanced[i] = _norm(e, axis=0)
        st = enhanced

    if epoch is not None:
        progress = epoch / max_epoch
        cd = 0.5 * (1 + math.cos(math.pi * progress))
        temp = temperature * (0.5 + 0.5 * cd)
    else:
        temp = temperature

    inst = 0.0
    tri = np.stack([img, txt, st], axis=1)
    for i in range(b):
        sim = tri[i] @ tri[i].T / temp
        for row in range(3):
            rs = sim[row]
            mask = np.ones(3)
            mask[row] = 0
            pos = np.sum(np.exp(rs * mask))
            alls = np.sum(np.exp(rs))
            inst -= np.log(pos / (alls + 1e-8))
    inst /= 3 * b

    lm = (labels[:, None] == labels[None, :]).astype(float) * (1 - np.eye(b))
    ii = img @ img.T / temp
    cat, valid = 0.0, 0
    for i in range(b):
        ex = np.exp(ii[i] - ii[i].max())
        pos = np.sum(ex * lm[i])
        alls = np.sum(ex * (1 - np.eye(b))[i])
        if pos > 0 and alls > 0:
            cat -= np.log(pos / (alls + 1e-8))
            valid += 1
    if valid:
        cat /= valid
    return 1.0 * inst + 0.5 * cat, inst, cat


def _rand_feats(rng, b, d=16):
    return (rng.standard_normal((b, d)).astype(np.float32) for _ in range(3))


def test_unicl_matches_naive_no_evolution(rng):
    b = 12
    img, txt, st = _rand_feats(rng, b)
    labels = rng.integers(0, 4, b)
    states = rng.choice([1, 3, 4], b)
    total, aux = unicl_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(st),
                            jnp.asarray(labels), jnp.asarray(states))
    ref_total, ref_inst, ref_cat = naive_unicl(img, txt, st, labels, states)
    np.testing.assert_allclose(float(total), ref_total, rtol=1e-5)
    np.testing.assert_allclose(float(aux["instance_loss"]), ref_inst, rtol=1e-5)
    np.testing.assert_allclose(float(aux["category_loss"]), ref_cat, rtol=1e-5)


def test_unicl_matches_naive_with_evolution(rng):
    b, c = 14, 5
    img, txt, st = _rand_feats(rng, b)
    labels = rng.integers(0, c, b)
    states = rng.choice([1, 3, 4], b)
    evo = rng.standard_normal((c, 16)).astype(np.float32)
    evo_valid = np.array([True, True, False, True, True])
    total, aux = unicl_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(st),
        jnp.asarray(labels), jnp.asarray(states),
        epoch=jnp.asarray(3), max_epoch=10,
        evolution_embeddings=jnp.asarray(evo), evolution_valid=jnp.asarray(evo_valid),
    )
    ref_total, ref_inst, ref_cat = naive_unicl(
        img, txt, st, labels, states, epoch=3, max_epoch=10, evo=evo, evo_valid=evo_valid
    )
    np.testing.assert_allclose(float(total), ref_total, rtol=1e-4)
    np.testing.assert_allclose(float(aux["instance_loss"]), ref_inst, rtol=1e-4)
    np.testing.assert_allclose(float(aux["category_loss"]), ref_cat, rtol=1e-4)


def test_unicl_singleton_class_evolution_path(rng):
    """Classes with exactly one sample take the 0.8/0.2 blend."""
    b = 6
    img, txt, st = _rand_feats(rng, b)
    labels = np.array([0, 0, 1, 2, 2, 3])  # classes 1 and 3 are singletons
    states = np.array([1, 4, 4, 1, 1, 3])  # class 2 has 2 samples but one state
    evo = rng.standard_normal((4, 16)).astype(np.float32)
    evo_valid = np.ones(4, bool)
    total, _ = unicl_loss(
        jnp.asarray(img), jnp.asarray(txt), jnp.asarray(st),
        jnp.asarray(labels), jnp.asarray(states),
        evolution_embeddings=jnp.asarray(evo), evolution_valid=jnp.asarray(evo_valid),
    )
    ref_total, _, _ = naive_unicl(img, txt, st, labels, states, evo=evo, evo_valid=evo_valid)
    np.testing.assert_allclose(float(total), ref_total, rtol=1e-4)


def test_unicl_batch_of_one_returns_zero(rng):
    img, txt, st = _rand_feats(rng, 1)
    total, _ = unicl_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(st),
                          jnp.asarray([0]), jnp.asarray([4]))
    assert float(total) == 0.0


def test_dynamic_temperature_decay():
    t0 = float(dynamic_temperature(0.07, jnp.asarray(0), 10))
    t_mid = float(dynamic_temperature(0.07, jnp.asarray(5), 10))
    t_end = float(dynamic_temperature(0.07, jnp.asarray(10), 10))
    assert np.isclose(t0, 0.07)
    assert np.isclose(t_mid, 0.07 * 0.75)
    assert np.isclose(t_end, 0.07 * 0.5)
    assert np.isclose(float(dynamic_temperature(0.07, None, None)), 0.07)
