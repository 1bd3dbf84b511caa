"""Network tests: shapes, softmax/tanh ranges, BN stats, loss modes,
and a sanity gradient step (tiny net, 9x9)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sejonggo_tpu.nets import AZNet, az_loss, dummy_predict_fn, init_variables, make_predict_fn

SIZE = 9
A = SIZE * SIZE + 1


def tiny_net():
    return AZNet(size=SIZE, blocks=2, filters=16, value_hidden=16,
                 compute_dtype="float32")


def test_forward_shapes_and_ranges():
    net = tiny_net()
    variables = init_variables(net, jax.random.PRNGKey(0))
    x = jnp.zeros((4, SIZE, SIZE, 17), jnp.float32)
    logits, value = net.apply(variables, x, train=False)
    assert logits.shape == (4, A)
    assert value.shape == (4, 1)
    probs = jax.nn.softmax(logits, -1)
    assert np.allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    assert np.all(np.abs(np.asarray(value)) <= 1.0)


def test_predict_fn_matches_apply():
    net = tiny_net()
    variables = init_variables(net, jax.random.PRNGKey(1))
    predict = make_predict_fn(net)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, SIZE, SIZE, 17))
    probs, values = predict(variables, x)
    logits, v2 = net.apply(variables, x, train=False)
    assert np.allclose(np.asarray(probs), np.asarray(jax.nn.softmax(logits, -1)), atol=1e-6)
    assert np.allclose(np.asarray(values), np.asarray(v2))


def test_batchnorm_stats_update_in_train_mode():
    net = tiny_net()
    variables = init_variables(net, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(3), (8, SIZE, SIZE, 17))
    _, mutated = net.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after))


def test_loss_modes():
    logits = jnp.zeros((2, A))
    values = jnp.array([[0.5], [-0.5]])
    ptarget = jnp.ones((2, A)) / A
    vtarget = jnp.array([1.0, -1.0])
    for mode in ("agz", "reference"):
        total, metrics = az_loss(logits, values, ptarget, vtarget, mode)
        assert np.isfinite(float(total))
        assert metrics["value_mse"] == 0.25


def test_training_step_reduces_loss():
    net = tiny_net()
    variables = init_variables(net, jax.random.PRNGKey(0))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(1e-2, momentum=0.9)
    opt_state = tx.init(params)

    x = jax.random.normal(jax.random.PRNGKey(4), (16, SIZE, SIZE, 17))
    ptarget = jax.nn.one_hot(jnp.arange(16) % A, A)
    vtarget = jnp.where(jnp.arange(16) % 2 == 0, 1.0, -1.0)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            (logits, values), mut = net.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            total, _ = az_loss(logits, values, ptarget, vtarget)
            return total, mut["batch_stats"]

        (total, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, total

    losses = []
    for _ in range(10):
        params, batch_stats, opt_state, total = step(params, batch_stats, opt_state)
        losses.append(float(total))
    assert losses[-1] < losses[0]


def test_dummy_predict_matches_reference_dummy():
    # reference test/tests.py:40-49
    boards = jnp.zeros((3, SIZE, SIZE, 17))
    policy, value = dummy_predict_fn(boards)
    expected = np.array(list(reversed(range(1, A + 1))), np.float32)
    expected /= expected.sum()
    assert np.allclose(np.asarray(policy[0]), expected)
    assert np.all(np.asarray(value) == 1.0)
