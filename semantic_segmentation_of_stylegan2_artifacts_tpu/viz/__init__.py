from .maps import (  # noqa: F401
    create_bin_heat_mask_from_list,
    overlay_mask_on_image,
    save_color_heatmap,
    save_contour_heatmap,
)
