from agarcl_tpu.parallel.mesh import ShardedVecEnv, make_env_mesh

__all__ = ["ShardedVecEnv", "make_env_mesh"]
