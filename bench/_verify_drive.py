import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np
from agarcl_tpu.gym_env import AgarioEnv
env = AgarioEnv(obs_type="grid", arena_size=100, num_pellets=60,
                num_viruses=3, num_bots=0, mode=3, grid_size=32)
obs, _ = env.reset(seed=5)
m0 = None
for i in range(30):
    obs, r, done, trunc, info = env.step(((0.7, 0.2), 0))
print("gym grid ok; last reward", float(r), "obs", obs.shape, obs.dtype)

from agarcl_tpu import EnvConfig
from agarcl_tpu.vec import VecEnv
import jax.numpy as jnp
cfg = EnvConfig(num_agents=1, ticks_per_step=2, arena_size=100,
                num_pellets=60, num_viruses=2, num_bots=0,
                reward_type=True, mode=4)
venv = VecEnv(cfg, 64, obs_type="ram", backend="xla", donate=False)
states, obs0 = venv.reset(0)
acts = jnp.zeros((64, 1, 3), jnp.float32).at[..., 0].set(0.5)
states, obs, rr, dd = venv.multi_step(states, acts, 4)
print("vec multi_step ok:", obs.shape, rr.shape, dd.shape,
      "finite:", bool(np.isfinite(np.asarray(obs)).all()))
# in-kernel multi-step parity in interpret mode (the changed path)
import functools
import agarcl_tpu.ops.fused_step as FS
from agarcl_tpu.obs.ram import RamObsConfig, ram_frame
frame_fn = functools.partial(ram_frame, cfg, RamObsConfig())
st4 = jax.tree.map(lambda x: x[:4], states)
s_m, o_m, r_m, d_m = FS.fused_env_multi_step(cfg, st4, acts[:4], 2,
                                             obs_fn=frame_fn, block_envs=4,
                                             interpret=True)
s_r = st4
ol, rl = [], []
for _ in range(2):
    s_r, o, r, d = FS.fused_env_step(cfg, s_r, acts[:4], obs_fn=frame_fn,
                                     num_frames=1, block_envs=4,
                                     interpret=True)
    ol.append(o); rl.append(r)
np.testing.assert_allclose(np.asarray(o_m), np.asarray(jnp.stack(ol)),
                           rtol=1e-5, atol=1e-4)
np.testing.assert_allclose(np.asarray(r_m), np.asarray(jnp.stack(rl)),
                           atol=1e-3)
print("in-kernel multi-step parity ok")
