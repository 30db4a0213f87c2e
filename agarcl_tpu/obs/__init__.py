from agarcl_tpu.obs.grid import GridObsConfig, grid_frame, grid_observe
from agarcl_tpu.obs.ram import RamObsConfig, ram_frame, ram_size

__all__ = ["GridObsConfig", "grid_frame", "grid_observe", "RamObsConfig",
           "ram_frame", "ram_size"]
