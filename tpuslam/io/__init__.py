from .dataset import (
    list_images,
    StereoImageDataset,
    import_poses,
    save_poses,
    load_poses,
    save_links,
    load_links,
)
