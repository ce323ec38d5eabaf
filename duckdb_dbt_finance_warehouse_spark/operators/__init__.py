from . import asof, dedup, multimodal, sessionize, similarity, text

__all__ = ["asof", "dedup", "multimodal", "sessionize", "similarity", "text"]
