from stutter_tpu.serve.classify import ServingClassifier
from stutter_tpu.serve.combined import CombinedExtractor
from stutter_tpu.serve.http import HttpEmbeddingFrontend
from stutter_tpu.serve.server import EmbeddingServer, Request, Response, jsonl_requests

__all__ = ["CombinedExtractor", "EmbeddingServer", "HttpEmbeddingFrontend",
           "Request", "Response", "ServingClassifier", "jsonl_requests"]
