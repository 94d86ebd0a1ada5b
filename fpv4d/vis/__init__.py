from fpv4d.vis import raster, ego_overlay, world_view, export
