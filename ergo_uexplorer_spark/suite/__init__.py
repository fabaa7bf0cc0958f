"""Suite registry: import all suite modules so their @register calls run."""

from .base import REGISTRY, QueryDef  # noqa: F401
from . import relational  # noqa: F401
from . import windows  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import textops  # noqa: F401
from . import olap  # noqa: F401
from . import temporal  # noqa: F401
from . import grouped  # noqa: F401
from . import registers  # noqa: F401
from . import multimodal  # noqa: F401
from . import extras  # noqa: F401
from . import zw  # noqa: F401
from . import zy  # noqa: F401
from . import zya  # noqa: F401
from . import zyb  # noqa: F401
from . import zyc  # noqa: F401
from . import zyd  # noqa: F401
from . import zye  # noqa: F401
from . import zyf  # noqa: F401
from . import zyg  # noqa: F401
from . import zyh  # noqa: F401
