"""nat-tpu: TPU-native neural audio tokenizer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
defcron/neural-audio-tokenizer ("Tim's Ears"): audio → timestamped,
multi-layer discrete token streams (`lam_audio_tokens` NDJSON) for LLM
consumption, with a dual semantic/acoustic encoder, 8-layer residual vector
quantization, RLE/keyframe stream compression, codebook seeding + caching,
metrics/visualization, a compat fallback, and data-parallel scale-out across
TPU chips.
"""

from .version import VERSION, VERSION_TAG

__version__ = VERSION.lstrip("v")

__all__ = [
    "VERSION",
    "VERSION_TAG",
    "AudioTokenizationPipeline",
    "NeuralAudioTokenizer",
    "ResidualVectorQuantizer",
    "CompatTokenizer",
    "NDJSONStreamer",
    "StreamingProtocol",
    "TokenFormatter",
    "TokenBudgetMeter",
    "TokenizationEvaluator",
    "Trainer",
    "DataParallelRunner",
    "TokenServer",
    "TokenClient",
]


def __getattr__(name):
    # Lazy public API: keep `import nat_tpu` light (no JAX import) so the
    # CLI's compat path starts fast and works on hosts without accelerators.
    if name == "AudioTokenizationPipeline":
        from .runtime.pipeline import AudioTokenizationPipeline

        return AudioTokenizationPipeline
    if name == "NeuralAudioTokenizer":
        from .models.tokenizer import NeuralAudioTokenizer

        return NeuralAudioTokenizer
    if name == "ResidualVectorQuantizer":
        from .quant.rvq import ResidualVectorQuantizer

        return ResidualVectorQuantizer
    if name == "CompatTokenizer":
        from .models.compat import CompatTokenizer

        return CompatTokenizer
    if name == "NDJSONStreamer":
        from .stream.ndjson import NDJSONStreamer

        return NDJSONStreamer
    if name == "StreamingProtocol":
        from .stream.protocol import StreamingProtocol

        return StreamingProtocol
    if name == "TokenFormatter":
        from .stream.formatter import TokenFormatter

        return TokenFormatter
    if name == "TokenBudgetMeter":
        from .eval.budget import TokenBudgetMeter

        return TokenBudgetMeter
    if name == "TokenizationEvaluator":
        from .eval.metrics import TokenizationEvaluator

        return TokenizationEvaluator
    if name == "Trainer":
        from .runtime.trainer import Trainer

        return Trainer
    if name == "DataParallelRunner":
        from .parallel.runner import DataParallelRunner

        return DataParallelRunner
    if name == "TokenServer":
        from .runtime.server import TokenServer

        return TokenServer
    if name == "TokenClient":
        from .client import TokenClient

        return TokenClient
    raise AttributeError(f"module 'nat_tpu' has no attribute {name!r}")
