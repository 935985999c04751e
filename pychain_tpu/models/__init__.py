from .tdnn import TDNN, TDNNConfig
from .lstm import BLSTM, BLSTMConfig

__all__ = ["TDNN", "TDNNConfig", "BLSTM", "BLSTMConfig"]
