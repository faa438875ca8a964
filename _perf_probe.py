import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from popcorn_tpu.config import ModelConfig, TrainConfig
from popcorn_tpu.compat.torch_convert import load_popcorn_from_dda
from popcorn_tpu.data.normalize import NormStats
from popcorn_tpu.train.state import make_optimizer, make_train_step

mcfg = ModelConfig(pretrained=True, compute_dtype="bfloat16")
tcfg = TrainConfig()
params, consts = load_popcorn_from_dda(mcfg)
opt = make_optimizer(tcfg)
opt_state = opt.init(params)
step = make_train_step(mcfg, tcfg, consts, NormStats(), opt)
rng = np.random.default_rng(0); key = jax.random.PRNGKey(0)
for B,H,W in [(2,2048,2048),(2,1024,1024)]:
    batch = jax.device_put({
        "S2": rng.uniform(0,4000,(B,H,W,4)).astype(np.float32),
        "S1": rng.uniform(-25,0,(B,H,W,2)).astype(np.float32),
        "admin_mask": np.ones((B,H,W), np.float32),
        "census_idx": np.ones(B, np.float32),
        "y": rng.uniform(10,1000,(B,)).astype(np.float32),
        "photometric": np.asarray([1.0,1.2,1.0,0.9], np.float32),
    })
    p2, os2, aux = step(params, opt_state, batch, key)
    _ = float(aux["optimization_loss"])
    t0=time.time(); n=5
    for _i in range(n):
        p2, os2, aux = step(p2, os2, batch, key)
        _ = float(aux["optimization_loss"])
    dt=(time.time()-t0)/n
    print(f"train step {B}x{H}: {dt*1000:.0f} ms -> {B*H*W/1e6/dt:.1f} Mpix/s fwd+bwd", flush=True)
