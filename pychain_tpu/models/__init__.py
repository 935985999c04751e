from .tdnn import TDNN, TDNNConfig

__all__ = ["TDNN", "TDNNConfig"]
