from emx.scope.protocol import (
    OPCODES,
    Instruction,
    FileTransport,
    SocketTransport,
    MicroscopeClient,
)
from emx.scope.sim import SimulatedMicroscope, FileMarionette
from emx.scope.env import FresnelEnv, fresnel_quantifier
from emx.scope.classifier import FringeClassifier, train_fringe_classifier

__all__ = [
    "OPCODES",
    "Instruction",
    "FileTransport",
    "SocketTransport",
    "MicroscopeClient",
    "SimulatedMicroscope",
    "FileMarionette",
    "FresnelEnv",
    "fresnel_quantifier",
    "FringeClassifier",
    "train_fringe_classifier",
]
