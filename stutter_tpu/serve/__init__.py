from stutter_tpu.serve.server import EmbeddingServer, Request, Response, jsonl_requests

__all__ = ["EmbeddingServer", "Request", "Response", "jsonl_requests"]
