"""L9 observability layer — the conjure equivalent (SURVEY.md §5):
a KV-backed collection of logged values (audio/arrays/scalars/time series),
a live HTTP dashboard, and static HTML article export."""

from .collection import Collection, loggers
from .server import serve_collection
from .article import conjure_article, AudioComponent, ImageComponent

__all__ = [
    "Collection",
    "loggers",
    "serve_collection",
    "conjure_article",
    "AudioComponent",
    "ImageComponent",
]
