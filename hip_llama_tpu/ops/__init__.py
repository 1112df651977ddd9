from hip_llama_tpu.ops.quant import QTensor, q8_matmul, q8_quantize_weights

__all__ = ["QTensor", "q8_matmul", "q8_quantize_weights"]
