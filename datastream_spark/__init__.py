"""datastream_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of wlanslovenija/datastream, extended
with large-scale training-data pipeline operators.

See SURVEY.md for the full blueprint; the public facade is
:class:`datastream_spark.datastream.Datastream`.
"""

from .exceptions import (  # noqa: F401
    AppendToDerivedStreamNotAllowed,
    DatastreamException,
    IncompatibleGranularities,
    IncompatibleTypes,
    InconsistentStreamConfiguration,
    InvalidOperatorArguments,
    InvalidTimestamp,
    MultipleStreamsReturned,
    OutstandingDependenciesError,
    StreamNotFound,
    UnsupportedDownsampler,
    UnsupportedGranularity,
    UnsupportedDeriveOperator,
)
from .granularity import GRANULARITIES, Granularity  # noqa: F401

__version__ = "0.1.0"
