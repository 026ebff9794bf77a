from .mtl import ESMM, MMOE, PLE, SharedBottom
from .satrans import SATrans
from .star import StarNet
from .star_trans_legacy import StarTrans, Starv2Trans, Starv3Trans, Starv4Trans
from .zoo import (AFM, DCN, NFM, PNN, AdaSparse, AutoInt, DeepFM, FiBiNET,
                  WDL, XDeepFM)

MODEL_REGISTRY = {
    "SATrans": SATrans,
    "Star_Net": StarNet,
    "Star_Trans": StarTrans,
    "Starv2_Trans": Starv2Trans,
    "Starv3_Trans": Starv3Trans,
    "Starv4_Trans": Starv4Trans,
    "WDL": WDL,
    "DeepFM": DeepFM,
    "DCN": DCN,
    "xDeepFM": XDeepFM,
    "NFM": NFM,
    "AFM": AFM,
    "PNN": PNN,
    "AutoInt": AutoInt,
    "FiBiNET": FiBiNET,
    "AdaSparse": AdaSparse,
    "SharedBottom": SharedBottom,
    "MMOE": MMOE,
    "PLE": PLE,
    "ESMM": ESMM,
}

__all__ = ["AFM", "AdaSparse", "AutoInt", "DCN", "DeepFM", "ESMM", "FiBiNET",
           "MMOE", "MODEL_REGISTRY", "NFM", "PLE", "PNN", "SATrans",
           "SharedBottom", "StarNet", "StarTrans", "Starv2Trans",
           "Starv3Trans", "Starv4Trans", "WDL", "XDeepFM"]
