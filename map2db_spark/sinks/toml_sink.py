"""forgemap rebuild-config TOML sink (S13, reference
map2db.py:1185-1308): bbox, optional start/comment/createdby, the
variable-tag key list, the subfile zoom intervals, and the three
source-table bindings.
"""

from __future__ import annotations


def render_config(
    db_pathname: str, dblstr: str, header, vtagslist: list[str]
) -> str:
    out = []
    out.append(
        "## This is a configuration file for forgemap.\n"
        "## It was created by map2db_spark to facilitate building a new"
        f' mapsforge map from the output database: "{db_pathname}".\n'
        "## See the forgemap documentation for a full explanation of the"
        " content of this configuration file.\n"
    )
    out.append(
        "## name of the mapsforge file to produce.\n"
        f'output_pathname = "{db_pathname}.map"'
    )
    out.append(f'dbl = """{dblstr}"""')
    out.append(
        f"minlat = {header.minlat}\nmaxlat = {header.maxlat}\n"
        f"minlon = {header.minlon}\nmaxlon = {header.maxlon}"
    )
    if header.startlat is not None:
        out.append(f"start_lat = {header.startlat}")
    if header.startlon is not None:
        out.append(f"start_lon = {header.startlon}")
    if header.startzoom is not None:
        out.append(f"start_zoom = {header.startzoom}")
    if header.comment:
        out.append(f'comment_str = """{header.comment}"""')
    if header.createdby:
        out.append(f'created_by = """{header.createdby}"""')

    reserved = {
        "m2db_name",
        "m2db_house_num",
        "m2db_elevation",
        "m2db_reference",
        "m2db_label_lat",
        "m2db_label_lon",
    }
    user_vtags = [v for v in vtagslist if v not in reserved]
    vtags_str = ""
    if vtagslist:
        lines = [
            '## tags whose "key" is in variable_tags will have their'
            ' "value" encoded with each individual feature.  This is'
            " useful for widely used keys whose values are each used by"
            " only one (or a few) features.",
            "variable_tags = [",
        ]
        lines += [f'    "{v}",' for v in user_vtags]
        lines.append("]")
        out.append("\n".join(lines))
        vtags_str = (
            "value_tags = [\n"
            + "".join(f'    {{column_name = "{v}"}},\n' for v in user_vtags)
            + "]\n"
        )

    out.append(
        "## [[map_data]] is a list of tables, each of which defines a"
        " subfile that will contain the vector map data for a specified"
        " zoom interval.  These must be in order from smallest to"
        " largest.  All values must be integers.\n"
        "## For each subfile: minzoom <= level <= maxzoom\n"
        "## map_data[i][maxzoom] < map_data[i+1][minzoom]"
    )
    for sf in header.subfiles:
        out.append(
            f"[[map_data]]\nminzoom = {sf.minzoom}\nlevel = {sf.level}\n"
            f"maxzoom = {sf.maxzoom}\n"
        )

    nosimplify = header.subfiles[-1].level
    for layer, extra in [
        ("points", 'elevation_column = "m2db_elevation"'),
        (
            "lines",
            'reference_column = "m2db_reference"\n'
            'label_lat_column = "m2db_label_lat"\n'
            'label_lon_column = "m2db_label_lon"',
        ),
        (
            "areas",
            'reference_column = "m2db_reference"\n'
            'label_lat_column = "m2db_label_lat"\n'
            'label_lon_column = "m2db_label_lon"',
        ),
    ]:
        out.append(
            "[[sources]]\n"
            f'pathname = "{db_pathname}"\n'
            f'layer = "{layer}"\n'
            'name_column = "m2db_name"\n'
            'house_num_column = "m2db_house_num"\n'
            f"{extra}\n"
            f"nosimplify = {nosimplify}\n"
            'minzoom_column = "m2db_minz"\n'
            'maxzoom_column = "m2db_maxz"\n'
            'json_tags = ["m2db_tags"]\n'
            f"{vtags_str}"
        )
    return "\n\n".join(out) + "\n"


def write_config(
    config_pathname: str, db_pathname: str, dblstr: str, header, vtagslist
) -> str:
    with open(config_pathname, "w", encoding="utf-8") as f:
        f.write(render_config(db_pathname, dblstr, header, vtagslist))
    return config_pathname
