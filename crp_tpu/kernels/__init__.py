from .spmm_jnp import spmm_segment_sum, DeviceCSR, pack_device_csr

__all__ = ["spmm_segment_sum", "DeviceCSR", "pack_device_csr"]
