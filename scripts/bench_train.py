import os, sys, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import hspose_tpu
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from hspose_tpu.config import default_config
from hspose_tpu.engine.train_step import build_train_step
from hspose_tpu.models.hspose import build_model

cfg = default_config()
if os.environ.get("HSPOSE_COMPUTE_DTYPE"):
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, compute_dtype=os.environ["HSPOSE_COMPUTE_DTYPE"]))
model = build_model(cfg)
print("building state...", flush=True)
tx, state, train_step = build_train_step(cfg, model, jax.random.key(0))
rng = np.random.default_rng(0)
bs, n = 16, 1028
A = rng.normal(size=(bs,3,3)); Q,_ = np.linalg.qr(A)
Q *= np.sign(np.linalg.det(Q))[:,None,None]
batch = {
  "pcl_in": jnp.asarray(rng.normal(scale=0.2,size=(bs,n,3)),jnp.float32),
  "cat_id": jnp.asarray((np.arange(bs)%6).astype(np.float32)),
  "rotation": jnp.asarray(Q, jnp.float32),
  "translation": jnp.asarray(rng.normal(scale=0.1,size=(bs,3)),jnp.float32),
  "fsnet_scale": jnp.asarray(rng.normal(scale=0.01,size=(bs,3)),jnp.float32),
  "mean_shape": jnp.asarray(np.abs(rng.normal(size=(bs,3)))*0.1+0.1,jnp.float32),
  "sym_info": jnp.asarray(np.tile([[0,1,0,0]],(bs,1)),jnp.float32),
  "aug_bb": jnp.asarray(rng.uniform(0.8,1.2,(bs,3)),jnp.float32),
  "aug_rt_t": jnp.asarray(rng.normal(scale=0.01,size=(bs,3)),jnp.float32),
  "aug_rt_R": jnp.asarray(np.tile(np.eye(3,dtype=np.float32),(bs,1,1))),
  "model_point": jnp.asarray(rng.normal(scale=0.1,size=(bs,1024,3)),jnp.float32),
  "nocs_scale": jnp.asarray(np.abs(rng.normal(size=(bs,)))+0.5,jnp.float32),
}
print("compiling train step...", flush=True)
key = jax.random.key(1)
state, m = train_step(state, batch, key)
print("first step loss:", float(np.asarray(m["total_loss"])), flush=True)
iters=20
t0=time.perf_counter()
for _ in range(iters):
    state, m = train_step(state, batch, key)
loss = float(np.asarray(m["total_loss"]))
dt=(time.perf_counter()-t0)/iters
print(f"train step: {dt*1000:.1f} ms/step, {bs/dt:.1f} samples/s, loss {loss:.3f}", flush=True)
