from .viz import gamma_correction, heatmap_rgb, project_range
