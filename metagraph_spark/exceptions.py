"""Engine exceptions.

Reference analog: ``metagraph/plugins/core/exceptions.py`` (ConvergenceError
raised when an iterative algorithm exceeds maxiter, see
``plugins/core/algorithms/centrality.py:34-36``).
"""


class MetagraphSparkError(Exception):
    """Base class for engine errors."""


class ConvergenceError(MetagraphSparkError):
    """Raised when an iterative algorithm fails to converge within maxiter."""


class GraphPropertyError(MetagraphSparkError):
    """Raised when a graph does not satisfy an algorithm's requirements
    (e.g. directed graph passed to an undirected-only algorithm).

    Reference analog: metagraph's dispatch-time abstract-property checks
    (``core/resolver.py:417-494``).
    """
