from .tdnn import TDNN, TDNNConfig
from .lstm import BLSTM, BLSTMConfig
from .tdnnf import (
    TDNNF,
    TDNNFConfig,
    constrain_semi_orthogonal,
    semi_orthogonal_deviation,
)

__all__ = [
    "TDNN", "TDNNConfig",
    "BLSTM", "BLSTMConfig",
    "TDNNF", "TDNNFConfig",
    "constrain_semi_orthogonal", "semi_orthogonal_deviation",
]
