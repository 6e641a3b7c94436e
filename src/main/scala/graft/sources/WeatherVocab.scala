package graft.sources

/** The wire model's full enum vocabulary, surfaced as queryable metadata
  * — the reference response identifies every data column by enum ids
  * (`VariableWithValues`: variable/unit/aggregation/altitude), so a
  * consumer joining results back to names needs these tables.
  *
  * Entry lists are verbatim from the reference SDK, indexed by wire id:
  *   - `VARIABLES`    — openmeteo_sdk/Variable.py:6-170 (165 entries)
  *   - `UNITS`        — openmeteo_sdk/Unit.py:6-48 (43 entries)
  *   - `AGGREGATIONS` — openmeteo_sdk/Aggregation.py:6-21 (16 entries)
  *   - `PROBABILITIES`— openmeteo_sdk/Probability.py:6-44 (39 entries)
  * (`MODELS` lives on [[WeatherGridSource]], which stamps it per row.)
  *
  * The reference API addresses variables by SURFACE NAME
  * (`temperature_2m`), which the response decomposes into (variable
  * enum, altitude) — [[measureToVariable]] is that rule: a trailing
  * `_<n>m` is the altitude in metres, the rest is the enum name.
  */
object WeatherVocab {

  val VARIABLES: Seq[String] = Seq(
    "undefined", "apparent_temperature", "cape", "cloud_cover",
    "cloud_cover_high", "cloud_cover_low", "cloud_cover_mid",
    "daylight_duration", "dew_point", "diffuse_radiation",
    "diffuse_radiation_instant", "direct_normal_irradiance",
    "direct_normal_irradiance_instant", "direct_radiation",
    "direct_radiation_instant", "et0_fao_evapotranspiration",
    "evapotranspiration", "freezing_level_height", "growing_degree_days",
    "is_day", "latent_heat_flux", "leaf_wetness_probability",
    "lifted_index", "lightning_potential", "precipitation",
    "precipitation_hours", "precipitation_probability", "pressure_msl",
    "rain", "relative_humidity", "runoff", "sensible_heat_flux",
    "shortwave_radiation", "shortwave_radiation_instant", "showers",
    "snow_depth", "snow_height", "snowfall", "snowfall_height",
    "snowfall_water_equivalent", "sunrise", "sunset", "soil_moisture",
    "soil_moisture_index", "soil_temperature", "surface_pressure",
    "surface_temperature", "temperature", "terrestrial_radiation",
    "terrestrial_radiation_instant",
    "total_column_integrated_water_vapour", "updraft", "uv_index",
    "uv_index_clear_sky", "vapour_pressure_deficit", "visibility",
    "weather_code", "wind_direction", "wind_gusts", "wind_speed",
    "vertical_velocity", "geopotential_height", "wet_bulb_temperature",
    "river_discharge", "wave_height", "wave_period", "wave_direction",
    "wind_wave_height", "wind_wave_period", "wind_wave_peak_period",
    "wind_wave_direction", "swell_wave_height", "swell_wave_period",
    "swell_wave_peak_period", "swell_wave_direction", "pm10", "pm2p5",
    "dust", "aerosol_optical_depth", "carbon_monoxide", "nitrogen_dioxide",
    "ammonia", "ozone", "sulphur_dioxide", "alder_pollen", "birch_pollen",
    "grass_pollen", "mugwort_pollen", "olive_pollen", "ragweed_pollen",
    "european_aqi", "european_aqi_pm2p5", "european_aqi_pm10",
    "european_aqi_nitrogen_dioxide", "european_aqi_ozone",
    "european_aqi_sulphur_dioxide", "us_aqi", "us_aqi_pm2p5",
    "us_aqi_pm10", "us_aqi_nitrogen_dioxide", "us_aqi_ozone",
    "us_aqi_sulphur_dioxide", "us_aqi_carbon_monoxide",
    "sunshine_duration", "convective_inhibition",
    "shortwave_radiation_clear_sky", "global_tilted_irradiance",
    "global_tilted_irradiance_instant", "ocean_current_velocity",
    "ocean_current_direction", "cloud_base", "cloud_top", "mass_density",
    "boundary_layer_height", "formaldehyde", "glyoxal",
    "non_methane_volatile_organic_compounds", "pm10_wildfires",
    "peroxyacyl_nitrates", "secondary_inorganic_aerosol",
    "residential_elementary_carbon", "total_elementary_carbon",
    "pm2_5_total_organic_matter", "sea_salt_aerosol", "nitrogen_monoxide",
    "thunderstorm_probability", "rain_probability",
    "freezing_rain_probability", "ice_pellets_probability",
    "snowfall_probability", "carbon_dioxide", "methane",
    "sea_level_height_msl", "sea_surface_temperature",
    "invert_barometer_height", "hail", "albedo", "precipitation_type",
    "convective_cloud_base", "convective_cloud_top",
    "snow_depth_water_equivalent", "secondary_swell_wave_height",
    "secondary_swell_wave_period", "secondary_swell_wave_peak_period",
    "secondary_swell_wave_direction", "tertiary_swell_wave_height",
    "tertiary_swell_wave_period", "tertiary_swell_wave_peak_period",
    "tertiary_swell_wave_direction", "wind_u_component",
    "wind_v_component", "temperature_max24h", "temperature_min24h",
    "temperature_mean24h", "snow_density", "longwave_radiation",
    "sea_ice_cover", "k_index", "roughness_length",
    "potential_evapotranspiration", "wave_peak_period",
    "temperature_max6h", "temperature_min6h", "lightning_density",
    "sea_ice_thickness")

  val UNITS: Seq[String] = Seq(
    "undefined", "celsius", "centimetre", "cubic_metre_per_cubic_metre",
    "cubic_metre_per_second", "degree_direction", "dimensionless_integer",
    "dimensionless", "european_air_quality_index", "fahrenheit", "feet",
    "fraction", "gdd_celsius", "geopotential_metre",
    "grains_per_cubic_metre", "gram_per_kilogram", "hectopascal", "hours",
    "inch", "iso8601", "joule_per_kilogram", "kelvin", "kilopascal",
    "kilogram_per_square_metre", "kilometres_per_hour", "knots",
    "megajoule_per_square_metre", "metre_per_second_not_unit_converted",
    "metre_per_second", "metre", "micrograms_per_cubic_metre",
    "miles_per_hour", "millimetre", "pascal", "per_second", "percentage",
    "seconds", "unix_time", "us_air_quality_index",
    "watt_per_square_metre", "wmo_code", "parts_per_million",
    "kilogram_per_cubic_metre")

  val AGGREGATIONS: Seq[String] = Seq(
    "none", "minimum", "maximum", "mean", "p10", "p25", "median", "p75",
    "p90", "dominant", "sum", "spread", "anomaly", "sot10", "sot90", "efi")

  val PROBABILITIES: Seq[String] = Seq(
    "none", "gt0", "gt0p1", "gt1", "gt2", "gt3", "gt4", "gt5", "gt8",
    "gt10", "gt15", "gt20", "gt25", "gt30", "gt35", "gt40", "gt50", "gt60",
    "gt75", "gt80", "gt100", "lt0", "lt0p1", "lt1", "ltm1", "ltm2", "ltm3",
    "ltm4", "ltm5", "ltm8", "ltm10", "ltm15", "ltm20", "gt1stdev",
    "gt1p5stdev", "gt2stdev", "lt1stdev", "lt1p5stdev", "lt2stdev")

  /** All four vocabularies as one (kind, id, name) relation. */
  val ALL: Seq[(String, Int, String)] =
    Seq("variable" -> VARIABLES, "unit" -> UNITS,
        "aggregation" -> AGGREGATIONS, "probability" -> PROBABILITIES)
      .flatMap { case (kind, names) =>
        names.zipWithIndex.map { case (n, i) => (kind, i, n) }
      }

  /** Surface-name decomposition: (`enum name`, `altitude metres or 0`).
    * `temperature_2m` → ("temperature", 2); names without the suffix
    * (e.g. `rain`) pass through with altitude 0 — the FlatBuffers
    * scalar default the reference returns for an absent field
    * (openmeteo_sdk/VariableWithValues.py:104-108).
    */
  def measureToVariable(measure: String): (String, Int) = {
    val m = "_([0-9]+)m$".r.findFirstMatchIn(measure)
    m match {
      case Some(mm) => (measure.substring(0, mm.start), mm.group(1).toInt)
      case None => (measure, 0)
    }
  }
}
