"""Hand-computed feature-vector tests (F1-F4, FIXTURES scenario 26)."""
from wikidata_edit_history_ray.core import features as F


class TestLevenshtein:
    def test_basic(self):
        assert F.levenshtein_distance("kitten", "sitting") == 3
        assert F.levenshtein_distance("", "abc") == 3
        assert F.levenshtein_distance("abc", "abc") == 0
        assert F.levenshtein_distance("flaw", "lawn") == 2

    def test_known_answers_pin_shared_oracle(self):
        """The conformance shim feeds this SAME implementation to the
        reference as its Levenshtein module — these independent known-answer
        cases keep a shared bug from passing conformance undetected."""
        assert F.levenshtein_distance("saturday", "sunday") == 3
        assert F.levenshtein_distance("intention", "execution") == 5
        assert F.levenshtein_distance("gumbo", "gambol") == 2
        assert F.levenshtein_distance("a" * 40, "a" * 39 + "b") == 1
        assert F.levenshtein_distance("abcdefghij", "jihgfedcba") == 10
        assert F.levenshtein_distance("Ünïcødé", "Unicode") == 4
        assert F.levenshtein_distance("x" * 100, "") == 100

    def test_edit_operations_backtrace(self):
        ins, dels, subs = F._edit_operations("kitten", "sitting")
        assert (ins, dels, subs) == (1, 0, 2)

    def test_adjacent_swap(self):
        assert F.has_adjacent_swap("tent", "tetn") == 1
        assert F.has_adjacent_swap("caro", "caor") == 1
        assert F.has_adjacent_swap("abc", "abcd") == 0
        assert F.has_adjacent_swap("abcd", "acbd") == 1
        assert F.has_adjacent_swap("abcd", "badc") == 0  # two swaps


class TestTextFeatures:
    def test_full_text_vector(self):
        r = F.create_text_features("text", '"hello world"', '"hello there world"')
        (token_overlap, old_in_new, new_in_old, edr, complete,
         length_diff, tc_old, tc_new, lev, same_special, special_diff,
         ins, dels, subs, swap, has_prefix, has_suffix) = r
        assert token_overlap == 2 / 3
        assert old_in_new == 0 and new_in_old == 0
        assert complete == 0
        assert length_diff == 6 and tc_old == 2 and tc_new == 3
        assert lev == 6 and ins == 6 and dels == 0 and subs == 0
        assert has_prefix == 1 and has_suffix == 1

    def test_complete_replacement(self):
        r = F.create_text_features("text", "aaa", "zzz")
        assert r[4] == 1  # complete_replacement

    def test_entity_variant_short_vector(self):
        r = F.create_text_features("entity", "a", "b")
        assert len(r) == 5


class TestTimeFeatures:
    def test_simple_day_shift(self):
        r = F.create_time_features("+2020-01-10T00:00:00Z", "+2020-01-15T00:00:00Z")
        (diff, sign, one_to_zero, day_add, day_rm, mon_add, mon_rm,
         dy, dd, dm) = r
        assert diff == 5
        assert sign == 0  # different dates => value[1:] differs
        assert (dy, dm) == (0, 0) and dd == 1

    def test_year_change(self):
        r = F.create_time_features("+2013-10-28T00:00:00Z", "+2014-10-28T00:00:00Z")
        assert r[0] == 365  # int(1 * 365.25)
        assert r[7] == 1  # different_year

    def test_refinement_not_a_day_change(self):
        # 2020-01-01 -> 2020-05-10 is a refinement (month/day added)
        r = F.create_time_features("+2020-01-01T00:00:00Z", "+2020-05-10T00:00:00Z")
        assert r[3] == 1  # day_added
        assert r[5] == 1  # month_added
        assert r[8] == 0 and r[9] == 0  # not flagged as real day/month change

    def test_placeholder_to_zero(self):
        r = F.create_time_features("+2020-01-01T00:00:00Z", "+2020-00-00T00:00:00Z")
        assert r[2] == 1

    def test_bce_year(self):
        r = F.create_time_features("-0044-03-15T00:00:00Z", "-0043-03-15T00:00:00Z")
        assert r[7] == 1  # different_year
        assert r[0] == 365

    def test_sign_only_change(self):
        r = F.create_time_features("+2020-01-01T00:00:00Z", "-2020-01-01T00:00:00Z")
        assert r[1] == 1  # sign_change


class TestQuantityFeatures:
    def test_precision_only_change(self):
        r = F.create_quantity_features('"+12.5"', '"+12.55"')
        sign, precision, inc, dec, whole, oin, nio, same = r
        assert precision == 1 and whole == 0 and sign == 0
        assert oin == 1 and inc == 1

    def test_int_to_decimal_not_precision_change(self):
        r = F.create_quantity_features('"+12"', '"+12.0"')
        assert r[1] == 0  # 12 -> 12.0 is not a precision change
        assert r[7] == 1  # same_float_value

    def test_sign_change_same_whole(self):
        r = F.create_quantity_features('"+12.5"', '"-12.5"')
        assert r[0] == 1 and r[4] == 0

    def test_whole_number_change(self):
        r = F.create_quantity_features('"+12"', '"+13"')
        assert r[4] == 1 and r[0] == 0


class TestGlobeFeatures:
    def test_precision_and_containment(self):
        old = '{"longitude": 13.4, "latitude": 52.5}'
        new = '{"longitude": 13.4, "latitude": 52.52}'
        r = F.create_globe_coordinate_features(old, new)
        (lat_sign, lon_sign, lat_whole, lon_whole, lat_prec, lon_prec,
         lat_inc, lat_dec, lon_inc, lon_dec, lat_oin, lat_nio, lat_same,
         lon_oin, lon_nio, lon_same) = r
        assert lat_prec == 1 and lon_prec == 0
        assert lat_oin == 1 and lat_inc == 1
        assert lon_same == 1 and lat_same == 0
        assert lat_whole == 0 and lat_sign == 0

    def test_lat_sign_change(self):
        old = '{"longitude": 10.0, "latitude": 52.5}'
        new = '{"longitude": 10.0, "latitude": -52.5}'
        r = F.create_globe_coordinate_features(old, new)
        assert r[0] == 1  # latitude_sign_change
        assert r[2] == 0  # whole number same
