from tti.app.results import measurement_to_dict
from tti.app.sources import DirectorySource, FrameSource, OpenCVCameraSource, SyntheticSource

__all__ = [
    "measurement_to_dict",
    "DirectorySource",
    "FrameSource",
    "OpenCVCameraSource",
    "SyntheticSource",
]
