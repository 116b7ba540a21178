from .cal3ds2 import Cal3DS2, project_point, uncalibrate
from .camera import backproject, cloud_from_images, depth_to_cloud
from .features import FeatureFrame, extract_features, harris_corners
from .frontend import (get_extractor, match_node_pair, match_one_to_many,
                       match_frames_device)
from .sift import SiftKeypoints, dog_keypoints, sift_features
from .matching import (
    MatchingResult,
    match_descriptors,
    ransac_rigid,
    umeyama,
    vo_information,
)
from .ba import TrackBook, two_frame_ba

__all__ = [
    "Cal3DS2", "project_point", "uncalibrate",
    "backproject", "cloud_from_images", "depth_to_cloud",
    "FeatureFrame", "extract_features", "harris_corners",
    "SiftKeypoints", "dog_keypoints", "sift_features", "get_extractor",
    "match_node_pair", "match_one_to_many", "match_frames_device",
    "MatchingResult", "match_descriptors", "ransac_rigid", "umeyama",
    "vo_information",
    "TrackBook", "two_frame_ba",
]
