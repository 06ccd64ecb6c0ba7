"""Reference-shaped record + error types.

Mirrors the reference exports (/root/reference/lib/index.js:9-18): the
``Url`` record (/root/reference/lib/Url.js:10-25) and the typed crawl
errors (/root/reference/lib/error/index.js:3-8). The engine itself is
columnar — these exist for API parity so reference users can construct /
receive the same shapes (the facade accepts ``Url`` wherever the reference
does, via the ``.url`` attribute).
"""

from __future__ import annotations

ERROR_MESSAGE_MAX = 1000  # lib/Url.js:69-75 truncates on read


class Url:
    """A URL waiting to be crawled or already crawled, with crawl state.

    Accepts a plain string or keyword options, like the reference
    constructor (lib/Url.js:10-25)."""

    def __init__(self, url=None, status_code=None, error_code=None,
                 error_message=None):
        if isinstance(url, Url):
            status_code = url.status_code
            error_code = url.error_code
            error_message = url.error_message
            url = url.url
        self.url = url
        self.status_code = status_code
        self.error_code = error_code
        self.error_message = error_message

    # reference accessor parity (lib/Url.js:33-75)
    def get_unique_id(self) -> str:
        return self.url

    def get_url(self) -> str:
        return self.url

    def get_status_code(self):
        return self.status_code

    def get_error_code(self):
        return self.error_code

    def get_error_message(self):
        if isinstance(self.error_message, str):
            return self.error_message[:ERROR_MESSAGE_MAX]
        return None

    def __repr__(self) -> str:
        return (f"Url(url={self.url!r}, status_code={self.status_code!r}, "
                f"error_code={self.error_code!r})")

    def __eq__(self, other) -> bool:
        if not isinstance(other, Url):
            return NotImplemented
        return (self.url, self.status_code, self.error_code,
                self.error_message) == (other.url, other.status_code,
                                        other.error_code, other.error_message)

    def __hash__(self) -> int:
        return hash(self.url)


class RobotsNotAllowedError(Exception):
    """URL denied by robots.txt (lib/error/index.js:4)."""


class HttpError(Exception):
    """HTTP status >= 400 (lib/error/index.js:5); carries ``status_code``
    like the reference attaches ``err.statusCode`` (lib/Crawler.js:403-408).
    """

    def __init__(self, message: str = "", status_code: int | None = None):
        super().__init__(message)
        self.status_code = status_code


class RequestError(Exception):
    """Network-level failure (lib/error/index.js:6)."""
