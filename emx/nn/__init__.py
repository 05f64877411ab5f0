from emx.nn.blocks import (
    Norm,
    ConvBlock,
    SepConvBlock,
    DeconvBlock,
    ASPP,
    XceptionMiddleBlock,
)
from emx.nn.denoiser import Denoiser, DenoiserConfig
from emx.nn.infilling import (
    InfillingConfig,
    InfillingGenerator,
    MultiscaleDiscriminator,
    multiscale_crops,
)
from emx.nn.autoencoder import (
    SmallAEConfig,
    SmallAutoencoder,
    XceptionAEConfig,
    XceptionAutoencoder,
    EmbedderConfig,
    UnsupervisedEmbedder,
    embedder_metric_loss,
)
from emx.nn.kernels import KernelBank, KernelStack, SymmetricKernel
from emx.nn.latent import LatentAEConfig, LatentAutoencoder
from emx.nn.vaegan import NestedVAEGAN, SpectralCritic, VAEGANConfig
from emx.nn.manifold import ManifoldConfig, SharedManifoldTranslator
from emx.nn.style import RestyleNet, StyleTransferConfig, transfer_style
from emx.nn.profiles import ProfileMLP, ProfileMLPConfig

__all__ = [
    "LatentAEConfig",
    "LatentAutoencoder",
    "NestedVAEGAN",
    "SpectralCritic",
    "VAEGANConfig",
    "ManifoldConfig",
    "SharedManifoldTranslator",
    "RestyleNet",
    "StyleTransferConfig",
    "transfer_style",
    "ProfileMLP",
    "ProfileMLPConfig",
    "InfillingConfig",
    "InfillingGenerator",
    "MultiscaleDiscriminator",
    "multiscale_crops",
    "SmallAEConfig",
    "SmallAutoencoder",
    "XceptionAEConfig",
    "XceptionAutoencoder",
    "EmbedderConfig",
    "UnsupervisedEmbedder",
    "embedder_metric_loss",
    "KernelBank",
    "KernelStack",
    "SymmetricKernel",
    "Norm",
    "ConvBlock",
    "SepConvBlock",
    "DeconvBlock",
    "ASPP",
    "XceptionMiddleBlock",
    "Denoiser",
    "DenoiserConfig",
]
