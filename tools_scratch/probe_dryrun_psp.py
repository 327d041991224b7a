"""Where does the warm-cache pSp dryrun spend its 227 s? Split trace/lower,
compile (should be persistent-cache hits), and execute on the 8-dev CPU mesh.
Run: JAX_PLATFORMS=cpu python tools_scratch/probe_dryrun_psp.py
"""
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

t00 = time.monotonic()


def P(msg):
    print(f"[+{time.monotonic() - t00:6.1f}s] {msg}", flush=True)


from face_mask_inpaint_tpu.losses.lpips import LPIPSNet
from face_mask_inpaint_tpu.losses.psp_loss import PSPLossConfig
from face_mask_inpaint_tpu.models.psp import PSP
from face_mask_inpaint_tpu.parallel.mesh import replicate_tree, shard_batch
from face_mask_inpaint_tpu.train.optim import ranger
from face_mask_inpaint_tpu.train.psp import make_psp_train_step, partitioned_tx
from face_mask_inpaint_tpu.train.state import ModuleState, TrainState

P("imports done")
devices = jax.devices("cpu")[:8]
mesh = Mesh(np.asarray(devices), ("data",))
key = jax.random.PRNGKey(0)
hw, n = 32, 8
rng = np.random.RandomState(0)
batch = {
    "src_img": (rng.rand(n, hw, hw, 3) * 2 - 1).astype(np.float32),
    "ref_img": (rng.rand(n, hw, hw, 3) * 2 - 1).astype(np.float32),
    "gt_img": (rng.rand(n, hw, hw, 3) * 2 - 1).astype(np.float32),
    "mask": (rng.rand(n, hw, hw) > 0.5).astype(np.float32),
}
model = PSP(output_size=hw, start_from_latent_avg=True,
            use_attention=True, num_layers=4)
x0 = jnp.asarray(batch["src_img"])
variables = model.init({"params": key, "noise": key}, x0, ref=x0,
                       src_mask=jnp.asarray(batch["mask"]), train=False)
P("model.init done")
img0 = jnp.zeros((1, hw, hw, 3))
nets = {"lpips": jax.tree.map(
    jnp.abs, LPIPSNet("alex").init(key, img0, img0)["params"])}
P("lpips init done")
cfg = PSPLossConfig(
    id_lambda=0.0, l2_lambda=1.0, lpips_lambda=0.1, style_lambda=0.0,
    cx_lambda=0.0, l2_lambda_ref=1.0, lpips_lambda_ref=0.1,
    w_norm_lambda=0.01, start_from_latent_avg=True)
mstate = ModuleState.from_variables(variables)
tx = partitioned_tx(ranger(1e-4), mstate.params, train_decoder=False)
state = TrainState(step=jnp.zeros([], jnp.int32), model=mstate,
                   opt_state=tx.init(mstate.params), rng=key)
state = replicate_tree(state, mesh)
nets_r = replicate_tree(nets, mesh)
sbatch = shard_batch(batch, mesh)
P("state sharded")
step = jax.jit(make_psp_train_step(
    model, tx, cfg, nets_r, use_ref=True, randomize_noise=False,
    resize=False))
lowered = step.lower(state, sbatch)
P("lowered (trace)")
compiled = lowered.compile()
P("compiled")
out = compiled(state, sbatch)
jax.block_until_ready(out)
P("executed 1")
out = compiled(out[0], sbatch)
jax.block_until_ready(out)
P("executed 2")
