"""supercrawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch Spark reimplementation of the capabilities of
``brendonboshell/supercrawler`` (reference at /root/reference, JavaScript):
batch micro-cycles over snapshot tables, DataFrame/SQL operators, vectorized
pandas/Arrow UDFs, window-rank priority queues, Bloom-filter seen sets —
plus the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal payload plumbing) a 100 TB crawl corpus needs.
"""

from .crawler import CrawlConfig, SparkCrawler
from .facade import Crawler, DbUrlList, FifoUrlList, RedisUrlList
from .handlers import (HandlerRegistry, HandlersError, default_registry,
                       html_link_parser, robots_parser, sitemaps_parser)
from .oracle import OracleConfig, OracleCrawler, web_pages_dict
from .records import HttpError, RequestError, RobotsNotAllowedError, Url
from .session import get_spark

__all__ = [
    "CrawlConfig", "SparkCrawler", "Crawler", "HandlerRegistry", "default_registry",
    "html_link_parser", "robots_parser", "sitemaps_parser",
    "OracleConfig", "OracleCrawler", "web_pages_dict", "get_spark",
    "Url", "RobotsNotAllowedError", "HttpError", "RequestError", "HandlersError",
    "FifoUrlList", "DbUrlList", "RedisUrlList",
]

__version__ = "0.1.0"
