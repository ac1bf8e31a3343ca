from prosper_tpu.models.linear import BSC, TSC, DSC

__all__ = ["BSC", "TSC", "DSC"]
