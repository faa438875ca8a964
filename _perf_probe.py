import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from popcorn_tpu.config import ModelConfig
from popcorn_tpu.compat.torch_convert import load_popcorn_from_dda
from popcorn_tpu.data.normalize import NormStats
from popcorn_tpu.infer.sliding import make_patch_forward, stack_ensemble
from popcorn_tpu.nn.init import init_head

mcfg = ModelConfig(pretrained=True, compute_dtype="bfloat16")
params0, consts = load_popcorn_from_dda(mcfg)
members = []
for seed in range(1600, 1605):
    m = dict(params0); m["head"] = init_head(jax.random.PRNGKey(seed), biasinit=0.94)
    members.append(m)
stacked = stack_ensemble(members)
rng = np.random.default_rng(0)
dev = jax.device_put({
    "S2": rng.uniform(0,4000,(1,2048,2048,4)).astype(np.float32),
    "S1": rng.uniform(-25,0,(1,2048,2048,2)).astype(np.float32),
    "mask": np.ones((1,2048,2048), np.float32),
    "valid": np.ones((1,), np.float32),
})
fwd = make_patch_forward(mcfg, consts, NormStats(), 5, single_dispatch=True)
t0=time.time(); r = fwd(stacked, dev); jax.block_until_ready(r)
print(f"fused compile+run: {time.time()-t0:.0f}s", flush=True)
for _ in range(2): r = fwd(stacked, dev)
jax.block_until_ready(r)
t0=time.time(); n=10
for _ in range(n): r = fwd(stacked, dev)
jax.block_until_ready(r)
print(f"fused single-dispatch: {(time.time()-t0)/n*1000:.0f} ms/patch -> {n/(time.time()-t0):.2f} p/s", flush=True)
