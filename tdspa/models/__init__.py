from tdspa.models.containers import (
    TrackAutoEncoderInputs,
    TrackAutoEncoder3DInputs,
    TrackAutoEncoderResults,
    TrackAutoEncoderDecoderContext,
)
from tdspa.models.trajan2d import TrackAutoEncoder
from tdspa.models.spa3d import TrackAutoEncoder3D
