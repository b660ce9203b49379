import numpy as np
import jax.numpy as jnp

from tungsten_tpu.math import transform as tf
from tungsten_tpu.math import vecops as vo


def test_translate_scale_compose():
    m = tf.mat4_from_json({"position": [1, 2, 3], "scale": 2})
    p = tf.transform_point(m, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(p, [3, 2, 3], atol=1e-6)


def test_scalar_scale_broadcast():
    m = tf.mat4_from_json({"scale": 5.43618})
    v = tf.transform_vector(m, np.eye(3))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), [5.43618] * 3, rtol=1e-6)


def test_rotation_90_about_y():
    # rotYXZ applies Y-rotation last-ish; a pure [0, 90, 0] should map +x -> -z
    # per the reference's convention (Mat4f::rotYXZ with x=z=0).
    m = tf.mat4_from_json({"rotation": [0, 90, 0]})
    p = tf.transform_vector(m, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(p, [0, 0, 1], atol=1e-6)
    p = tf.transform_vector(m, np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(p, [-1, 0, 0], atol=1e-6)


def test_look_at_builds_right_handed_frame():
    m = tf.mat4_from_json(
        {"position": [0, 1, 6.8], "look_at": [0, 1, 0], "up": [0, 1, 0]}
    )
    # camera forward (z column) points from position toward look_at
    np.testing.assert_allclose(tf.fwd(m), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(tf.up(m), [0, 1, 0], atol=1e-6)
    x, y, z = tf.right(m), tf.up(m), tf.fwd(m)
    assert np.dot(np.cross(x, y), z) > 0.0


def test_quad_prepare_matches_reference_semantics():
    # Quad::prepareForRender (Quad.cpp): edge0 = T*(1,0,0), edge1 = T*(0,0,1),
    # base = T*0 - 0.5*edge0 - 0.5*edge1. Floor quad of the cornell box spans
    # [-1, 1] x [-1, 1] at y=0 after scale [2, 4, 2] + rotation [0, 90, 0].
    m = tf.mat4_from_json({"scale": [2, 4, 2], "rotation": [0, 90, 0]})
    base = tf.transform_point(m, np.zeros(3))
    e0 = tf.transform_vector(m, np.array([1.0, 0, 0]))
    e1 = tf.transform_vector(m, np.array([0.0, 0, 1.0]))
    base = base - 0.5 * e0 - 0.5 * e1
    corners = [base, base + e0, base + e1, base + e0 + e1]
    c = np.array(corners)
    np.testing.assert_allclose(c[:, 1], 0.0, atol=1e-6)  # all at y=0
    assert np.max(np.abs(c[:, [0, 2]])) == np.float32(1.0) or np.allclose(
        np.max(np.abs(c[:, [0, 2]])), 1.0, atol=1e-5
    )


def test_tangent_frame_orthonormal():
    n = np.random.default_rng(1).normal(size=(128, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    t, b = vo.tangent_frame(n)
    np.testing.assert_allclose(vo.dot(t, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(vo.dot(b, n), 0.0, atol=1e-5)
    np.testing.assert_allclose(vo.dot(t, b), 0.0, atol=1e-5)
    np.testing.assert_allclose(vo.length(t), 1.0, atol=1e-5)
    # round trip
    v = jnp.asarray(np.random.default_rng(2).normal(size=(128, 3)), jnp.float32)
    loc = vo.to_local(t, b, n, v)
    glob = vo.to_global(t, b, n, loc)
    np.testing.assert_allclose(glob, v, atol=1e-4)
