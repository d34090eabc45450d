"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4(d))."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from score_sde_pytorch_tpu import losses, parallel, sde as sde_lib
from tests.test_losses import _setup

pytestmark = pytest.mark.slow  # 8-device jit compiles of full train/sample steps


def test_eight_virtual_devices():
  assert jax.device_count() == 8


def test_mesh_shapes():
  mesh = parallel.create_mesh()
  assert mesh.devices.shape == (8, 1)
  mesh2 = parallel.create_mesh(n_data=4, n_space=2)
  assert mesh2.devices.shape == (4, 2)


def test_sharded_train_step_matches_single_device():
  """The data-parallel step must produce the same loss/params trajectory as
  the single-device step (same RNG stream → same math, psum averaging)."""
  cfg, sde, model_def, state = _setup()
  optimizer = losses.get_optimizer(cfg)
  step_fn = losses.get_step_fn(sde, model_def, train=True,
                               optimizer=optimizer)
  batch = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))

  # single device
  s1, loss1 = jax.jit(step_fn)(state, batch)

  # 8-device mesh
  mesh = parallel.create_mesh()
  sharded_step = parallel.make_sharded_step(step_fn, mesh,
                                            donate_state=False)
  sharded_batch = parallel.shard_batch(np.asarray(batch), mesh)
  s8, loss8 = sharded_step(state, sharded_batch)

  np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
  l1 = jax.tree.leaves(s1.params)
  l8 = jax.tree.leaves(s8.params)
  for a, b in zip(l1, l8):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_sharded_batch_placement():
  mesh = parallel.create_mesh()
  batch = np.zeros((16, 8, 8, 3), np.float32)
  sharded = parallel.shard_batch(batch, mesh)
  assert sharded.sharding.spec == jax.sharding.PartitionSpec("data")
  # Each device holds 1/8 of the batch.
  shard_shapes = {s.data.shape for s in sharded.addressable_shards}
  assert shard_shapes == {(2, 8, 8, 3)}


def test_n_step_sharded():
  cfg, sde, model_def, state = _setup()
  optimizer = losses.get_optimizer(cfg)
  n_fn = losses.get_n_step_fn(sde, model_def, train=True,
                              optimizer=optimizer, n_steps=2)
  mesh = parallel.create_mesh()
  from score_sde_pytorch_tpu.parallel.mesh import make_sharded_n_step
  fn = make_sharded_n_step(n_fn, mesh, donate_state=False)
  batches = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 3))
  new_state, losses_out = fn(state, jax.device_put(
      np.asarray(batches),
      jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))))
  assert int(new_state.step) == 2
  assert np.all(np.isfinite(np.asarray(losses_out)))


def test_spatial_sharding_forward():
  """NCSN++ forward under a (data=4, space=2) mesh with H sharded."""
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from tests.test_models import tiny_config

  cfg = tiny_config()
  model_def, variables = mutils.create_model(cfg, jax.random.PRNGKey(0))
  mesh = parallel.create_mesh(n_data=4, n_space=2)
  x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
  t = jnp.full((8,), 0.5)

  fwd = jax.jit(
      lambda v, x, t: model_def.apply(v, x, t, train=False),
      in_shardings=(parallel.replicated(mesh),
                    parallel.spatial_sharding(mesh),
                    parallel.data_sharding(mesh)),
      out_shardings=parallel.spatial_sharding(mesh))
  out = fwd(variables, jax.device_put(x, parallel.spatial_sharding(mesh)),
            jax.device_put(t, parallel.data_sharding(mesh)))
  assert out.shape == (8, 16, 16, 3)
  assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_entrypoint():
  """The driver-facing dryrun on the virtual 8-device mesh."""
  import sys
  sys.path.insert(0, "/root/repo")
  import __graft_entry__ as g
  g.dryrun_multichip(8)
  g.dryrun_multichip(4)


def test_mesh_samplers_accept_committed_inputs():
  """Regression: the constraint-based mesh paths (dpmpp/heun/ode/
  likelihood) must accept inputs committed to a single device — exactly
  what run_lib.evaluate passes after an Orbax checkpoint restore. Before
  parallel.place_replicated they failed with 'Received incompatible
  devices' (device ids [0] vs the mesh); the PC sampler was immune via
  explicit in_shardings."""
  from score_sde_pytorch_tpu import likelihood, sampling
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from tests.test_models import tiny_config

  cfg = tiny_config()
  sde = sde_lib.VESDE(sigma_min=0.01, sigma_max=50.0, N=4)
  model_def, variables = mutils.create_model(cfg, jax.random.PRNGKey(0))
  mesh = parallel.create_mesh()
  shape = (8, 16, 16, 3)
  params_c = jax.device_put(variables["params"], jax.devices()[0])
  rng_c = jax.device_put(jax.random.PRNGKey(3), jax.devices()[0])

  fns = {
      "dpmpp": sampling.get_dpmpp_sampler(
          sde, model_def, shape, lambda x: x, n_steps=2, denoise=True,
          continuous=True, eps=1e-5, stochastic=True, mesh=mesh),
      "heun": sampling.get_heun_sampler(
          sde, model_def, shape, lambda x: x, n_steps=2, denoise=True,
          continuous=True, eps=1e-5, mesh=mesh),
      "ode": sampling.get_ode_sampler(
          sde, model_def, shape, lambda x: x, denoise=False, rtol=1e-3,
          atol=1e-3, eps=1e-2, mesh=mesh),
  }
  for tag, fn in fns.items():
    samples, _ = fn(rng_c, params_c)
    assert samples.shape == shape, tag

  lk = likelihood.get_likelihood_fn(sde, model_def, lambda x: x,
                                    rtol=1e-3, atol=1e-3, mesh=mesh)
  data = parallel.shard_batch(
      np.random.default_rng(0).normal(size=shape).astype(np.float32), mesh)
  bpd, _, _ = lk(rng_c, params_c, data)
  assert np.asarray(bpd).shape == (8,)


def test_sharded_pc_sampling():
  """Mesh-sharded sample generation: batch axis sharded over 8 devices."""
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import sampling, sde as sde_lib
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from tests.test_models import tiny_config

  cfg = tiny_config()
  sde = sde_lib.VESDE(sigma_min=0.01, sigma_max=50.0, N=4)
  model_def, variables = mutils.create_model(cfg, jax.random.PRNGKey(0))
  mesh = parallel.create_mesh()
  sampler = sampling.get_pc_sampler(
      sde, model_def, (16, 16, 16, 3),
      sampling.get_predictor("reverse_diffusion"),
      sampling.get_corrector("none"), lambda x: x, snr=0.16,
      continuous=True, mesh=mesh)
  samples, nfe = sampler(jax.random.PRNGKey(1), variables["params"])
  assert samples.shape == (16, 16, 16, 3)
  assert samples.sharding.spec == jax.sharding.PartitionSpec("data")
  assert {s.data.shape for s in samples.addressable_shards} == {(2, 16, 16, 3)}
  assert np.isfinite(np.asarray(samples)).all()


def test_spatial_sharding_constraints_stick():
  """With model.spatial_sharding on under an ambient (data, space) mesh, the
  forward keeps activations sharded along H and output stays correct."""
  import jax.numpy as jnp
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from tests.test_models import tiny_config

  cfg0 = tiny_config()
  cfg1 = tiny_config()
  cfg1.model.spatial_sharding = True
  m0, v0 = mutils.create_model(cfg0, jax.random.PRNGKey(0))
  mesh = parallel.create_mesh(n_data=4, n_space=2)
  x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
  t = jnp.full((8,), 0.5)
  out0 = m0.apply(v0, x, t, train=False)

  with jax.set_mesh(mesh):  # constraints need the ambient mesh at trace time
    m1, v1 = mutils.create_model(cfg1, jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, x, t: m1.apply(v, x, t, train=False),
                  out_shardings=parallel.spatial_sharding(mesh))
    out1 = fwd(v1, jax.device_put(x, parallel.spatial_sharding(mesh)),
               jax.device_put(t, parallel.data_sharding(mesh)))
  np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                             rtol=1e-4, atol=1e-5)


def test_sharded_ode_sampler_matches_single_device():
  """Mesh-sharded ODE sampler (VERDICT r2 #3): sharded over the 8-device
  mesh must equal the single-device result (same rng, deterministic RK45)."""
  from score_sde_pytorch_tpu import sampling
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from tests.test_models import tiny_config

  cfg = tiny_config()
  sde = sde_lib.VESDE(sigma_min=0.01, sigma_max=50.0, N=100)
  model_def, variables = mutils.create_model(cfg, jax.random.PRNGKey(0))
  shape = (8, 16, 16, 3)
  single = sampling.get_ode_sampler(sde, model_def, shape, lambda x: x,
                                    rtol=1e-4, atol=1e-4, eps=1e-5)
  mesh = parallel.create_mesh()
  sharded = sampling.get_ode_sampler(sde, model_def, shape, lambda x: x,
                                     rtol=1e-4, atol=1e-4, eps=1e-5,
                                     mesh=mesh)
  x1, nfe1 = single(jax.random.PRNGKey(5), variables["params"])
  x8, nfe8 = sharded(jax.random.PRNGKey(5), variables["params"])
  assert x8.sharding.spec == jax.sharding.PartitionSpec("data")
  np.testing.assert_allclose(np.asarray(x1), np.asarray(x8),
                             rtol=1e-3, atol=1e-4)


def test_sharded_heun_sampler_matches_single_device():
  from score_sde_pytorch_tpu import sampling
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from tests.test_models import tiny_config

  cfg = tiny_config()
  sde = sde_lib.VESDE(sigma_min=0.01, sigma_max=50.0, N=100)
  model_def, variables = mutils.create_model(cfg, jax.random.PRNGKey(0))
  shape = (8, 16, 16, 3)
  single = sampling.get_heun_sampler(sde, model_def, shape, lambda x: x,
                                     n_steps=4, eps=1e-5)
  mesh = parallel.create_mesh()
  sharded = sampling.get_heun_sampler(sde, model_def, shape, lambda x: x,
                                      n_steps=4, eps=1e-5, mesh=mesh)
  x1, _ = single(jax.random.PRNGKey(6), variables["params"])
  x8, _ = sharded(jax.random.PRNGKey(6), variables["params"])
  np.testing.assert_allclose(np.asarray(x1), np.asarray(x8),
                             rtol=1e-4, atol=1e-5)


def test_sharded_likelihood_matches_single_device():
  """Mesh-sharded bits/dim (VERDICT r2 #3): identical bpd values on the
  virtual 8-device mesh vs single device."""
  from score_sde_pytorch_tpu import likelihood as likelihood_lib
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from tests.test_models import tiny_config

  cfg = tiny_config(name="ddpm", embedding_type="positional",
                    scale_by_sigma=False)
  sde = sde_lib.VPSDE(N=100)
  model_def, variables = mutils.create_model(cfg, jax.random.PRNGKey(0))
  single = likelihood_lib.get_likelihood_fn(sde, model_def, lambda x: x,
                                            rtol=1e-3, atol=1e-3)
  mesh = parallel.create_mesh()
  sharded = likelihood_lib.get_likelihood_fn(sde, model_def, lambda x: x,
                                             rtol=1e-3, atol=1e-3, mesh=mesh)
  data = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))
  bpd1, _, nfe1 = single(jax.random.PRNGKey(2), variables["params"], data)
  bpd8, _, nfe8 = sharded(jax.random.PRNGKey(2), variables["params"], data)
  assert np.isfinite(np.asarray(bpd8)).all()
  np.testing.assert_allclose(np.asarray(bpd1), np.asarray(bpd8),
                             rtol=1e-3, atol=1e-3)


def test_sharded_eval_step_matches_single_device():
  """Eval-loss through make_sharded_step equals the plain-jit value."""
  cfg, sde, model_def, state = _setup()
  eval_fn = losses.get_step_fn(sde, model_def, train=False)
  batch = jax.random.normal(jax.random.PRNGKey(3), (16, 16, 16, 3))
  _, loss1 = jax.jit(eval_fn)(state, batch)
  mesh = parallel.create_mesh()
  eval_sharded = parallel.make_sharded_step(eval_fn, mesh,
                                            donate_state=False)
  _, loss8 = eval_sharded(state, parallel.shard_batch(np.asarray(batch),
                                                      mesh))
  np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)


def test_sharded_dpmpp_sampler_matches_single_device():
  from score_sde_pytorch_tpu import sampling
  from score_sde_pytorch_tpu.models import utils as mutils
  import score_sde_pytorch_tpu.models  # noqa: F401
  from tests.test_models import tiny_config

  cfg = tiny_config()
  sde = sde_lib.VESDE(sigma_min=0.01, sigma_max=50.0, N=100)
  model_def, variables = mutils.create_model(cfg, jax.random.PRNGKey(0))
  shape = (8, 16, 16, 3)
  single = sampling.get_dpmpp_sampler(sde, model_def, shape, lambda x: x,
                                      n_steps=4, eps=1e-5)
  mesh = parallel.create_mesh()
  sharded = sampling.get_dpmpp_sampler(sde, model_def, shape, lambda x: x,
                                       n_steps=4, eps=1e-5, mesh=mesh)
  x1, _ = single(jax.random.PRNGKey(6), variables["params"])
  x8, _ = sharded(jax.random.PRNGKey(6), variables["params"])
  np.testing.assert_allclose(np.asarray(x1), np.asarray(x8),
                             rtol=1e-4, atol=1e-5)


def test_to_local_identity_and_tree():
  """to_local: identity for fully-addressable arrays (the single-process
  case — multi-host arrays are not constructible here), pytrees and
  non-array leaves pass through, multiple args come back as a tuple."""
  import jax.numpy as jnp
  from score_sde_pytorch_tpu import parallel

  mesh = parallel.create_mesh()
  x = jax.device_put(jnp.ones((8, 4)), parallel.replicated(mesh))
  tree = {"a": x, "b": 3}
  out = parallel.to_local(tree)
  assert out["b"] == 3
  np.testing.assert_array_equal(np.asarray(out["a"]), np.ones((8, 4)))
  a, b = parallel.to_local(x, None)
  assert b is None
