from .base import (BasicAction, MemoryMixin, ExecAction, LoopAction,
                   WorkflowRunner, resolve_from_memory)
from .actions import (LoadModelsAction, BuildModelLoaderAction, LoadLoraAction,
                      LoadPartAction, RemoveLoraAction, LoadPluginAction,
                      RemovePluginAction, SaveImageAction,
                      TextHookAction, TextEncodeAction, AttnMultTextEncodeAction,
                      SeedAction, PrepareDiffusionAction, MakeTimestepsAction,
                      MakeLatentAction, NoisePredAction, SampleAction,
                      DiffusionStepAction, X0PredAction, EncodeAction,
                      DecodeAction, LatentResizeAction, ImageResizeAction,
                      BuildPluginAction, InputFeederAction, VaeOptimizeAction)

__all__ = [n for n in dir() if not n.startswith('_')]
