from gpmpc_tpu.control.mpc import MPC, MpcConsts, MpcState
from gpmpc_tpu.control.gpmpc import GPMPC

__all__ = ["MPC", "MpcConsts", "MpcState", "GPMPC"]
