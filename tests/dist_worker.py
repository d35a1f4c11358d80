"""Worker for the two-process ``jax.distributed`` smoke test
(tests/test_distributed.py).  Each process brings 4 virtual CPU devices;
together they form the 8-device global mesh and run one data-parallel
train step with host-sharded input — the multi-host DCN path that
single-process tests can't reach (reference equivalent: the
``nn.DataParallel`` wrap at bestengine.py:1032-1034, scaled out).

Run directly: python tests/dist_worker.py <process_id> <coordinator>.
"""

import os
import sys

proc_id = int(sys.argv[1])
coord = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=proc_id
)
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from guitar_tablature_classification_tpu.config import (  # noqa: E402
    MeshConfig,
    ModelConfig,
    OptimConfig,
)
from guitar_tablature_classification_tpu.data.pipeline import host_shard  # noqa: E402
from guitar_tablature_classification_tpu.models import build_model  # noqa: E402
from guitar_tablature_classification_tpu.parallel import (  # noqa: E402
    batch_sharding,
    make_mesh,
    param_shardings,
)
from guitar_tablature_classification_tpu.train import (  # noqa: E402
    create_train_state,
    make_preprocess,
    make_train_step,
)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh_cfg = MeshConfig()
mesh = make_mesh(mesh_cfg)
assert mesh.shape == {"data": 8, "model": 1}

# deterministic global batch; every process derives the same arrays
rng = np.random.default_rng(0)
B = 16
global_batch = {
    "features": rng.uniform(-120, 0, (B, 96, 9)).astype(np.float32),
    "labels": rng.integers(0, 19, (B, 6)).astype(np.int32),
}

model_cfg = ModelConfig(arch="small_cnn", dtype="float32")
model = build_model(model_cfg)
preprocess = make_preprocess(model_cfg)
state = create_train_state(
    model, OptimConfig(), jax.random.PRNGKey(0),
    preprocess(jnp.asarray(global_batch["features"][:1])),
)
state = jax.device_put(state, param_shardings(mesh, state, mesh_cfg))

# host-sharded loading: this process materializes ONLY its half, then the
# halves assemble into one global data-sharded array (no host gather).
local = host_shard(global_batch)
assert local["features"].shape == (B // 2, 96, 9)
sharding = batch_sharding(mesh, mesh_cfg)
batch = {
    k: jax.make_array_from_process_local_data(sharding, v, (B,) + v.shape[1:])
    for k, v in local.items()
}

train_step = make_train_step(model, preprocess)
new_state, metrics = train_step(state, batch, jax.random.PRNGKey(0), 1e-3)
loss = float(metrics["loss"])
step = int(new_state.step)
assert step == 1, step
assert np.isfinite(loss)

# cross-process agreement: the jitted step is SPMD — every process must
# observe the identical global loss (psum'd over ICI+DCN).
print(f"DIST_OK proc={proc_id} loss={loss:.6f}", flush=True)
jax.distributed.shutdown()
