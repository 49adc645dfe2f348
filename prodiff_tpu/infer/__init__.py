"""Inference pipeline (mirrors ``handler/infer`` + ``component/inferer``)."""
