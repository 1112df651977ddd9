from hip_llama_tpu.engine.engine import InferenceEngine, GenerationResult
from hip_llama_tpu.engine.requests import Requests, read_inputfile, write_outputfile

__all__ = [
    "InferenceEngine",
    "GenerationResult",
    "Requests",
    "read_inputfile",
    "write_outputfile",
]
