"""Legacy target-path compatibility: reference yamls say
``_target_: hcpdiff.X.Y`` — the instantiation layer remaps ``hcpdiff.*`` to
``hcpdiff_tpu.compat.*`` (config/instantiate.py), and this module re-exports
our equivalents under the reference's names."""

# data
from .data.dataset import (TextImagePairDataset, TextImageCondPairDataset,
                           CropInfoPairDataset, DataGroup, CycleData)
from .data import buckets as _buckets
from .data import sources as _sources
from .data.captions import (JsonCaptionLoader, YamlCaptionLoader,
                            TXTCaptionLoader, auto_caption_loader)
from .data.transforms import TagShuffle, TagDropout, TagErase, TemplateFill

# loggers
from .loggers import CLILogger, TBLogger, WanDBLogger, LoggerGroup

# losses / noise
from .diffusion.losses import (MSELoss, MinSNRLoss, SoftMinSNRLoss,
                               KDiffMinSNRLoss, EDMLoss)
from .diffusion.schedules import NoiseSchedule, pyramid_noise

# workflow actions under reference names
from .workflow import *  # noqa: F401,F403


class _Namespace:
    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


from .data.processor import ControlNetProcessor


# reference module paths like hcpdiff.data.bucket.RatioBucket.from_files
class data:  # noqa: N801
    TextImagePairDataset = TextImagePairDataset
    TextImageCondPairDataset = TextImageCondPairDataset
    CropInfoPairDataset = CropInfoPairDataset
    DataGroup = DataGroup
    bucket = _buckets
    source = _sources
    caption_loader = _Namespace(JsonCaptionLoader=JsonCaptionLoader,
                                YamlCaptionLoader=YamlCaptionLoader,
                                TXTCaptionLoader=TXTCaptionLoader,
                                auto_caption_loader=auto_caption_loader)
    data_processor = _Namespace(ControlNetProcessor=ControlNetProcessor)


class utils:  # noqa: N801
    caption_tools = _Namespace(TagShuffle=TagShuffle, TagDropout=TagDropout,
                               TagErase=TagErase, TemplateFill=TemplateFill)


class loggers:  # noqa: N801
    CLILogger = CLILogger
    TBLogger = TBLogger
    WanDBLogger = WanDBLogger


class loss:  # noqa: N801
    min_snr_loss = _Namespace(MinSNRLoss=MinSNRLoss,
                              SoftMinSNRLoss=SoftMinSNRLoss,
                              KDiffMinSNRLoss=KDiffMinSNRLoss,
                              EDMLoss=EDMLoss)
