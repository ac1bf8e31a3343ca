from prosper_tpu.models.linear import BSC, TSC, DSC
from prosper_tpu.models.mca import MCA, MMCA
from prosper_tpu.models.gsc import GSC

__all__ = ["BSC", "TSC", "DSC", "MCA", "MMCA", "GSC"]
