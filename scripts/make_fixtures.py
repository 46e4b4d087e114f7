#!/usr/bin/env python3
"""Generate the Lark-shaped CSV fixtures described in FIXTURES.md §A.

Layout: fixtures/lark/<table_id>/<partition>/data.csv, pandas-style with
a leading unnamed index column, epoch-ms timestamps, and Python-repr
strings for the semi-structured fields. Deterministic; re-runnable.
"""
import os
import pandas as pd

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "lark")

IDS = {
    "employee": "tblXTpGXeRW8mAfx",
    "attendance_record": "tblzcYy2TaKLtSIJ",
    "attendance": "tblyIrzuCoAorFyE",
    "payment": "tblV3dM091DDjHwq",
    "vendor": "tblZCiYqiaEdOR3f",
}

def ms(s):  # "2024-06-01T01:10:00" -> epoch ms (UTC)
    return int(pd.Timestamp(s, tz="UTC").timestamp() * 1000)

def write(table, partition, df):
    d = os.path.join(ROOT, IDS[table], partition)
    os.makedirs(d, exist_ok=True)
    df.to_csv(os.path.join(d, "data.csv"))  # keeps the index column

D1, D2 = "2024-06-01", "2024-06-02"

# ---- employee: day 1 (no 'gender' column at all; E004 has null user_id)
write("employee", D1, pd.DataFrame([
    {"user_id": "E001", "employee_no": "0001", "name": "raw-ignored",
     "user": "[{'id': 'ou_e001', 'name': 'Nguyen Van A'}]",
     "employee_type": "full", "email": "a@x.vn", "mobile": "090",
     "department_ids": "['od_1', 'od_2']", "departments": "Eng",
     "leader": None, "join_time": ms("2020-01-01T00:00:00"),
     "job_title": "Engineer", "city": "HN",
     "Parent items": "p", "Created By": "sys", "Modified By": "sys",
     "Date Created": ms("2024-05-01T00:00:00"),
     "Last Modified Date": ms("2024-06-01T05:00:00")},
    {"user_id": "E002", "employee_no": "0002", "name": "raw-ignored",
     "user": "[{'id': 'ou_e002', 'name': 'Tran Thi B'}]",
     "employee_type": "full", "email": "b@x.vn", "mobile": "091",
     "department_ids": "['od_1']", "departments": "Eng",
     "leader": "[{'id': 'ou_e001', 'name': 'Nguyen Van A'}]",
     "join_time": ms("2021-02-01T00:00:00"),
     "job_title": "Analyst", "city": "HCM",
     "Parent items": None, "Created By": "sys", "Modified By": "sys",
     "Date Created": ms("2024-05-01T00:00:00"),
     "Last Modified Date": ms("2024-06-01T05:10:00")},
    {"user_id": "E003", "employee_no": "0003", "name": "raw-ignored",
     "user": "garbage-not-a-literal",          # unparseable -> null lark_id
     "employee_type": "part", "email": None, "mobile": None,
     "department_ids": None, "departments": None, "leader": None,
     "join_time": None, "job_title": "Intern", "city": "DN",
     "Parent items": None, "Created By": "sys", "Modified By": "sys",
     "Date Created": ms("2024-05-02T00:00:00"),
     "Last Modified Date": ms("2024-06-01T05:20:00")},
    {"user_id": None, "employee_no": "0004", "name": "dropped",
     "user": None, "employee_type": None, "email": None, "mobile": None,
     "department_ids": None, "departments": None, "leader": None,
     "join_time": None, "job_title": None, "city": None,
     "Parent items": None, "Created By": None, "Modified By": None,
     "Date Created": None, "Last Modified Date": ms("2024-06-01T05:30:00")},
]))

# ---- employee: day 2 (E001 changed -> SCD2 branches 2+3; E005 net-new)
write("employee", D2, pd.DataFrame([
    {"user_id": "E001", "employee_no": "0001", "name": "raw-ignored",
     "user": "[{'id': 'ou_e001', 'name': 'Nguyen Van A'}]",
     "employee_type": "full", "email": "a@x.vn", "mobile": "090",
     "department_ids": "['od_1', 'od_3']", "departments": "Eng",
     "leader": None, "join_time": ms("2020-01-01T00:00:00"),
     "job_title": "Senior Engineer", "city": "HN", "gender": "M",
     "Parent items": "p", "Created By": "sys", "Modified By": "sys",
     "Date Created": ms("2024-05-01T00:00:00"),
     "Last Modified Date": ms("2024-06-02T04:00:00")},
    {"user_id": "E005", "employee_no": "0005", "name": "raw-ignored",
     "user": "[{'id': 'ou_e005', 'name': 'Le Van E'}]",
     "employee_type": "full", "email": "e@x.vn", "mobile": "094",
     "department_ids": "['od_2']", "departments": "Ops",
     "leader": "[{'id': 'ou_e001', 'name': 'Nguyen Van A'}]",
     "join_time": ms("2024-06-01T00:00:00"),
     "job_title": "Operator", "city": "HN", "gender": "F",
     "Parent items": None, "Created By": "sys", "Modified By": "sys",
     "Date Created": ms("2024-06-02T00:00:00"),
     "Last Modified Date": ms("2024-06-02T04:10:00")},
]))

# ---- vendor: day 1 two vendors; day 2 updates V1
write("vendor", D1, pd.DataFrame([
    {"Vendor": "[{'text': 'VENDOR-1'}]", "Tên tài khoản": "Cty A",
     "Số tài khoản": "111", "Ngân hàng": "VCB", "QR code": None,
     "Ghi chú": None, "Date Created": ms("2024-05-01T00:00:00"),
     "Last Modified Date": ms("2024-06-01T03:00:00")},
    {"Vendor": "[{'text': 'VENDOR-2'}]", "Tên tài khoản": "Cty B",
     "Số tài khoản": "222", "Ngân hàng": "TCB", "QR code": None,
     "Ghi chú": "note", "Date Created": ms("2024-05-01T00:00:00"),
     "Last Modified Date": ms("2024-06-01T03:05:00")},
]))
write("vendor", D2, pd.DataFrame([
    {"Vendor": "[{'text': 'VENDOR-1'}]", "Tên tài khoản": "Cty A JSC",
     "Số tài khoản": "111-9", "Ngân hàng": "VCB", "QR code": None,
     "Ghi chú": None, "Date Created": ms("2024-05-01T00:00:00"),
     "Last Modified Date": ms("2024-06-02T03:00:00")},
]))

# ---- attendance: day 1 (E001 early-in/early-out, E002 late-in,
#      E003 null checkout, one all-null row)
write("attendance", D1, pd.DataFrame([
    {"User id": "E001", "Result id": "A1", "Date": ms("2024-06-01T00:00:00"),
     "Employee": "Nguyen Van A", "Group name": "G1", "Shift name": "S1",
     "Check in record id": "ci1", "Check in time": ms("2024-06-01T00:50:00"),
     "Check in shift time": ms("2024-06-01T08:00:00"),
     "Check in location name": "HQ", "Check in - Is offsite": False,
     "Check in type": "gps", "Check in result": "ok",
     "Check in result supplement": None,
     "Check out record id": "co1", "Check out time": ms("2024-06-01T10:20:00"),
     "Check out shift time": ms("2024-06-01T17:30:00"),
     "Check out location name": "HQ", "Check out - Is offsite": False,
     "Check out type": "gps", "Check out result": "ok",
     "Check out result supplement": None, "Employee type": "full",
     "Nhân sự không đồng ý phiếu phạt": False, "Đi muộn / về sớm": True,
     "Muộn 20p/sớm 20p": False,
     "Giá phạt đi muộn/ về sớm": "[{'text': 50000}]",
     "Phạt muộn 20p/sớm 20p": 0, "Tiền phạt": 50000, "Lý do": "tac duong"},
    {"User id": "E002", "Result id": "A2", "Date": ms("2024-06-01T00:00:00"),
     "Employee": "Tran Thi B", "Group name": "G1", "Shift name": "S1",
     "Check in record id": "ci2", "Check in time": ms("2024-06-01T01:10:00"),
     "Check in shift time": ms("2024-06-01T08:00:00"),
     "Check in location name": "HQ", "Check in - Is offsite": None,
     "Check in type": "gps", "Check in result": "ok",
     "Check in result supplement": None,
     "Check out record id": "co2", "Check out time": ms("2024-06-01T10:35:00"),
     "Check out shift time": ms("2024-06-01T17:30:00"),
     "Check out location name": "HQ", "Check out - Is offsite": False,
     "Check out type": "gps", "Check out result": "ok",
     "Check out result supplement": None, "Employee type": "full",
     "Nhân sự không đồng ý phiếu phạt": False, "Đi muộn / về sớm": False,
     "Muộn 20p/sớm 20p": False, "Giá phạt đi muộn/ về sớm": 0,
     "Phạt muộn 20p/sớm 20p": 0, "Tiền phạt": None, "Lý do": None},
    {"User id": "E003", "Result id": "A3", "Date": ms("2024-06-01T00:00:00"),
     "Employee": "C", "Group name": "G2", "Shift name": "S2",
     "Check in record id": "ci3", "Check in time": ms("2024-06-01T01:00:00"),
     "Check in shift time": ms("2024-06-01T08:00:00"),
     "Check in location name": "HQ", "Check in - Is offsite": False,
     "Check in type": "gps", "Check in result": "ok",
     "Check in result supplement": None,
     "Check out record id": None, "Check out time": None,
     "Check out shift time": ms("2024-06-01T17:30:00"),
     "Check out location name": None, "Check out - Is offsite": None,
     "Check out type": None, "Check out result": None,
     "Check out result supplement": None, "Employee type": "part",
     "Nhân sự không đồng ý phiếu phạt": None, "Đi muộn / về sớm": None,
     "Muộn 20p/sớm 20p": None, "Giá phạt đi muộn/ về sớm": "junk",
     "Phạt muộn 20p/sớm 20p": None, "Tiền phạt": None, "Lý do": None},
    {c: None for c in [
     "User id", "Result id", "Date", "Employee", "Group name", "Shift name",
     "Check in record id", "Check in time", "Check in shift time",
     "Check in location name", "Check in - Is offsite", "Check in type",
     "Check in result", "Check in result supplement", "Check out record id",
     "Check out time", "Check out shift time", "Check out location name",
     "Check out - Is offsite", "Check out type", "Check out result",
     "Check out result supplement", "Employee type",
     "Nhân sự không đồng ý phiếu phạt", "Đi muộn / về sớm", "Muộn 20p/sớm 20p",
     "Giá phạt đi muộn/ về sớm", "Phạt muộn 20p/sớm 20p", "Tiền phạt", "Lý do"]},
]))

# ---- attendance_record: day 1
write("attendance_record", D1, pd.DataFrame([
    {"User id": "E001", "Record id": "R1", "Date": ms("2024-06-01T00:00:00"),
     "Employee": "Nguyen Van A", "Check time": ms("2024-06-01T00:50:00"),
     "Check location name": "HQ", "Is offsite": False},
    {"User id": "E002", "Record id": "R2", "Date": ms("2024-06-01T00:00:00"),
     "Employee": "Tran Thi B", "Check time": ms("2024-06-01T01:10:00"),
     "Check location name": "HQ", "Is offsite": True},
]))

# ---- payment: day 2 (joins against post-merge day-2 dims)
write("payment", D2, pd.DataFrame([
    {"Payment_ID": "[{'text': 'PAY-0001'}]",
     "Payment": "[{'text': 'Mua ban phim'}]",
     "Loại chi phí": "['Văn phòng phẩm']",
     "Ngày mua": ms("2024-06-02T02:00:00"),
     "Tên dự án": "P1", "Hàng hóa": "keyboard",
     "Đơn giá": 150000, "Số lượng": 2, "Tổng tiền": "[{'text': 300000}]",
     "Hóa đơn": "img1", "Minh chứng chuyển khoản": None,
     "Thông tin người cần chuyển khoản": "[{'text': 'VENDOR-1'}]",
     "Số tài khoản": "111-9", "Ngân hàng": "VCB",
     "Người mua": "{'id': 'ou_e001', 'name': 'Nguyen Van A'}",
     "Ghi chú": None, "CEO duyệt": True, "Kế toán đã thanh toán": False,
     "Người mua đã nhận được tiền": False,
     "Ngày CEO duyệt": ms("2024-06-02T03:00:00"),
     "Ngày kế toán chuyển khoản": None, "Ngày người mua nhận tiền": None},
    {"Payment_ID": "[{'text': 'PAY-0002'}]",
     "Payment": "[{'text': 'Thue van phong'}]",
     "Loại chi phí": "['Thuê ngoài']",
     "Ngày mua": ms("2024-06-02T02:30:00"),
     "Tên dự án": None, "Hàng hóa": "office",
     "Đơn giá": 5000000, "Số lượng": 1, "Tổng tiền": 5000000,
     "Hóa đơn": None, "Minh chứng chuyển khoản": None,
     "Thông tin người cần chuyển khoản": "[{'text': 'VENDOR-9'}]",  # unknown vendor
     "Số tài khoản": None, "Ngân hàng": None,
     "Người mua": "{'id': 'ou_e005', 'name': 'Le Van E'}",
     "Ghi chú": None, "CEO duyệt": False, "Kế toán đã thanh toán": False,
     "Người mua đã nhận được tiền": False,
     "Ngày CEO duyệt": None, "Ngày kế toán chuyển khoản": None,
     "Ngày người mua nhận tiền": None},
]))

print("fixtures written under", os.path.abspath(ROOT))
