from .heads import SimpleStringHeads, StackedDense, StringBranchHeads
from .resnet import BasicBlock, ResNet18
from .small_cnn import SmallTabCNN
from .tabnet import GuitarTabNet, ViTTab, build_model
from .vit import EncoderBlock, ViTBackbone

__all__ = [
    "BasicBlock",
    "EncoderBlock",
    "GuitarTabNet",
    "ResNet18",
    "SimpleStringHeads",
    "SmallTabCNN",
    "StackedDense",
    "StringBranchHeads",
    "ViTBackbone",
    "ViTTab",
    "build_model",
]
