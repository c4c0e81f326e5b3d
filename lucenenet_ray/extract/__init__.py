from lucenenet_ray.extract.html import (  # noqa: F401
    ExtractHTML,
    parse_html,
)
