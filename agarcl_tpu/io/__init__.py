from agarcl_tpu.io.snapshot import load_env_state, save_env_state

__all__ = ["save_env_state", "load_env_state"]
