from .criteria import check_refinement, RefinementConfig  # noqa: F401
from .prolong_restrict import restrict_average, prolongate_minmod  # noqa: F401
