from .rays import get_rays, get_rays_by_coord, ndc_rays
from .encoding import freq_encode, freq_encode_dim, sh_encode
from .sampling import stratified_z_vals, sample_pdf, searchsorted_right, merge_z_vals
from .render import raw2outputs, render_rays, render_rays_blocked, RenderOutputs
from .fields import (NeRFMLP, HashGridField, hash_encode, make_field_fn,
                     make_frozen_sigma_field_fn)
from .normals import (depth2xyz, depth2normal_geo, render_normal_map,
                      estimate_normals_grad)

__all__ = [
    "get_rays", "get_rays_by_coord", "ndc_rays",
    "freq_encode", "freq_encode_dim", "sh_encode",
    "stratified_z_vals", "sample_pdf", "searchsorted_right", "merge_z_vals",
    "raw2outputs", "render_rays", "render_rays_blocked", "RenderOutputs",
    "NeRFMLP", "HashGridField", "hash_encode", "make_field_fn",
    "make_frozen_sigma_field_fn",
    "depth2xyz", "depth2normal_geo", "render_normal_map", "estimate_normals_grad",
]
